package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline: quality scoring,
  * language identification, and document fingerprinting — all pure column
  * expressions over the documents table (no UDFs; the marker tables ride
  * along as literal arrays, the 100 TB equivalent of a broadcast dict).
  */
object TextAnalysis {

  /** Corpus composition rollup — the dataset-card query every training-data
    * release ships: per (source, lang) stratum, document and token counts,
    * mean tokens per doc, and exact interpolated length percentiles (the
    * Spark `percentile` ↔ DuckDB `quantile_cont` parity q_agg_percentiles
    * established).
    *
    * Scale stance: ONE partial-agg-friendly groupBy over a bounded key
    * space (|sources| × |langs|); counts/sums combine map-side. The exact
    * percentile buffers its group's values — fine for card-sized strata
    * and for sampled audits; at full-lake stratum sizes swap
    * `percentile` → `approx_percentile` (one token change, loses the
    * oracle, keeps the plan shape). */
  def q_corpus_stats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("bigint").as("n_toks"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        round(avg(col("n_toks")), 6).as("avg_tokens"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
        round(expr("percentile(n_chars, 0.9)"), 4).as("p90_chars"))
      .orderBy("source", "lang")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** Quality scoring: token stats + stopword ratio + a blended score — the
    * length/punct/stopword heuristics CommonCrawl-style filters use.
    * Fully SQL-expressible, so oracle-checked. */
  def q_text_quality(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"), col("n_chars"),
      explode(split(col("text"), " ")).as("tok"))
    tok.groupBy("doc_id")
      .agg(
        first(col("n_chars")).as("n_chars"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("tok").isin(stopwords: _*), 1L).otherwise(0L)).as("n_stop"),
        round(sum(length(col("tok")).cast("bigint")).cast("double") / count(lit(1)), 6)
          .as("avg_token_len"))
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("n_stop").cast("double") / col("n_tokens"), 6).as("stop_ratio"),
        col("avg_token_len"),
        // blended quality: long-enough docs with moderate stopword density
        round(
          least(col("n_tokens").cast("double") / 100.0, lit(1.0)) *
            (lit(1.0) - abs(col("n_stop").cast("double") / col("n_tokens") - 0.1)), 6)
          .as("quality"))
      .orderBy("doc_id")
      .limit(2000)
  }

  /** Language ID by marker-token voting: per language a small marker list
    * (the n-gram-profile approach collapsed to whole-token unigrams for the
    * synthetic corpus); prediction = argmax vote count with deterministic
    * tiebreak (lexicographically largest lang — greatest(struct) order),
    * 'und' when nothing matches. Oracle-checked: the DuckDB mirror encodes
    * the same tiebreak as a descending CASE chain. */
  def q_text_langid(s: SparkSession, d: String): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and", "is"),
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "es" -> Seq("el", "la", "los", "y", "es"),
      "fr" -> Seq("le", "la", "les", "et", "est"),
      "zh" -> Seq("de", "shi", "zai", "he", "le"))
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
    val scores = markers.map { case (l, ws) =>
      sum(when(col("tok").isin(ws: _*), 1L).otherwise(0L)).as(s"s_$l")
    }
    val scored = tok.groupBy("doc_id")
      .agg(first(col("lang")).as("lang"), scores: _*)
    val best = markers.map { case (l, _) => struct(col(s"s_$l").as("s"), lit(l).as("l")) }
    scored
      .select(col("doc_id"), col("lang"),
        greatest(best: _*).getField("l").as("pred"),
        greatest(markers.map(m => col(s"s_${m._1}")): _*).as("best_score"))
      .select(col("doc_id"), col("lang"),
        when(col("best_score") > 0, col("pred")).otherwise("und").as("pred"))
      .orderBy("doc_id")
      .limit(2000)
  }

  /** Deterministic stratified sampling — the reproducible train/eval split
    * a data pipeline needs (no rand(): membership is a pure function of
    * doc_id, so the same rows are sampled on every run and every engine).
    * Strata = lang; rate = 3/10 via doc_id % 10 < 3. */
  def q_sample_stratified(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 10 < 3)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_id"))
      .orderBy("lang")

  /** BPE-ish subword token counting: whitespace tokens further split by a
    * regex into letter runs / digit runs / single other chars — the
    * pre-tokenizer shape of byte-pair encoders. Oracle-checked (same regex
    * both engines). */
  def q_text_token_bpe(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("bigint").as("ws_tokens"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
          .cast("bigint").as("bpe_tokens"))
      .groupBy("lang")
      .agg(sum(col("ws_tokens")).as("n_ws_tokens"),
        sum(col("bpe_tokens")).as("n_bpe_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** Repetition-based quality filtering — the Gopher/MassiveText-style
    * signals that length/stopword heuristics (q_text_quality) miss:
    * duplicate-token ratio (1 − distinct/total) and the fraction of
    * bigram mass held by the single most frequent bigram. Docs failing
    * the thresholds get keep=0 (boilerplate / TEXT-loop spam shape).
    * The keep decision compares the ROUNDED ratios so both engines
    * agree at threshold boundaries.
    *
    * Scale stance: two explode → partial-agg groupBy(doc_id) pipelines
    * joined on doc_id — no windows, no arrays-per-row; the bigram count
    * collapses map-side before the per-doc max. */
  def q_text_quality_gopher(s: SparkSession, d: String): DataFrame =
    gopherQuality(Tables.documents(s, d))

  /** Core of [[q_text_quality_gopher]] over any (doc_id, text) frame —
    * separated so specs can drive the bigram-less path (single-token docs
    * have no bigrams: left join misses, top_bigram_frac coalesces to 0),
    * which the synthetic corpus (min 10 tokens/doc) never exercises. */
  private[graft] def gopherQuality(docs: DataFrame): DataFrame = {
    val tstats = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_distinct"))
    val bstats = docs
      .select(col("doc_id"),
        explode(graft.functions.ShingleHash.ngramArr(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("n_bigrams"))
    tstats.join(bstats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("rep_ratio"),
        round(coalesce(col("top_cnt").cast("double") / col("n_bigrams"), lit(0.0)), 6)
          .as("top_bigram_frac"))
      .withColumn("keep",
        when(col("n_tokens") >= 20 && col("rep_ratio") <= 0.6 &&
          col("top_bigram_frac") <= 0.05, 1L).otherwise(0L))
      .orderBy("doc_id")
      .limit(2000)
  }

  /** Deterministic domain-mixture sampling — the data-mixing step that
    * reweights source domains toward a target mixture (the Pile/DoReMi
    * pattern: keep web at 100%, downsample boilerplate-heavy sources).
    * Membership is a pure function of doc_id — Knuth multiplicative hash
    * mod 1e6 against an integer threshold — so the SAME documents are
    * kept on every run and every engine, and the kept set at a lower
    * rate is a SUBSET of the kept set at a higher rate (nested samples,
    * the property that lets a pipeline re-mix without re-reading).
    * Per-source target rates derive from the source index mod 4:
    * 1, 1/2, 1/4, 1/8 — all exact in the 1e6 integer threshold space.
    *
    * Scale stance: one narrow scan + one partial-agg groupBy(source);
    * the keep decision is a pure column expression pushed to the scan.
    * At 100 TB this is the cheapest possible shape. */
  def q_sample_mixture(s: SparkSession, d: String): DataFrame = {
    val idx = substring(col("source"), 4, 10).cast("int")
    val threshold = element_at(
      array(lit(1000000L), lit(500000L), lit(250000L), lit(125000L)),
      (pmod(idx, lit(4)) + 1).cast("int"))
    val kept = pmod(col("doc_id") * lit(2654435761L), lit(1000000L)) < threshold
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        threshold.as("thr"), when(kept, 1L).otherwise(0L).as("keep"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).as("n_kept"),
        round(min(col("thr")).cast("double") / 1000000L, 6).as("target_rate"),
        round(sum(col("keep")).cast("double") / count(lit(1)), 6).as("achieved_rate"))
      .orderBy("source")
  }

  /** Deterministic per-language quota sampling — the data-mixing step that
    * caps each stratum at a fixed document budget, selected by content hash
    * (md5(text), doc_id tiebreak for duplicate texts) so the sample is
    * reproducible across runs and engines, with no rand() anywhere.
    *
    * Scale stance: a lang-partitioned window alone would funnel each
    * language's ENTIRE corpus through one task's sort (the seed-rank
    * global-window lesson). Instead the classic two-phase top-K: phase 1
    * ranks within (lang, shard = doc_id mod 32) — 32-way parallel, each
    * sort 1/32 of the stratum — and keeps quota survivors per shard; the
    * global per-lang quota is a subset of that union, so phase 2's window
    * sees ≤ 32×quota bounded rows per lang. */
  def q_sample_quota(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quota = 25
    val shardW = Window.partitionBy("lang", "shard").orderBy("h", "doc_id")
    val langW = Window.partitionBy("lang").orderBy("h", "doc_id")
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), md5(col("text")).as("h"),
        pmod(col("doc_id"), lit(32)).as("shard"))
      .withColumn("srk", row_number().over(shardW))
      .filter(col("srk") <= quota)
      .withColumn("rk", row_number().over(langW).cast("int"))
      .filter(col("rk") <= quota)
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy("lang", "rk")
  }

  /** [no-oracle] Winnowing-style document fingerprint: the 4 smallest
    * 64-bit hashes over the doc's 5-gram shingles (a rolling-hash sketch;
    * near-identical docs share most sketch entries). The sketch is emitted
    * comma-joined (BIGINT→string is engine-stable; the driver comparator
    * cannot sort raw array cells). Shingle hashing is the native
    * ShingleMinK kernel — bit-identical to the sort+slice HOF form it
    * replaced (TextKernelsSpec), no shingle-string materialization. */
  def q_text_fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_join(graft.functions.ShingleHash.minK(col("text"), 4)
          .cast("array<string>"), ",").as("fingerprint"))
      .orderBy("doc_id")
      .limit(5000)

  private val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val phoneRe = """\+\d{1,3}-\d{3}-\d{4}"""
  private val ipRe = """\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"""

  /** PII redaction — the scrub stage every released training corpus runs:
    * mask emails, international phone numbers, and IPv4 addresses with
    * typed placeholders, and report per-document match counts. The
    * synthetic corpus is word soup, so the query first plants one
    * deterministic instance of each PII kind derived from doc_id (the
    * oracle plants the identical strings) — the masking and counting are
    * then exercised on every row rather than vacuously passing on text
    * with nothing to find. Patterns stay in the common Java-regex/RE2
    * subset (no backrefs, no lookaround) so both engines match
    * identically; masking order (email → phone → IP) matters only in that
    * placeholders contain no digits, so later passes can't re-match
    * earlier replacements; counts are taken on the pre-mask text.
    *
    * Scale stance: pure per-row column expressions inside one codegen
    * stage — no shuffle until the display sort. */
  def q_text_pii_mask(s: SparkSession, d: String): DataFrame = {
    val salted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com tel +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"))
    Tables.documents(s, d)
      .select(col("doc_id"), salted.as("t"))
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), lit(emailRe), lit("<EMAIL>")),
            lit(phoneRe), lit("<PHONE>")),
          lit(ipRe), lit("<IP>")).as("masked"),
        regexp_count(col("t"), lit(emailRe)).cast("bigint").as("n_emails"),
        regexp_count(col("t"), lit(phoneRe)).cast("bigint").as("n_phones"),
        regexp_count(col("t"), lit(ipRe)).cast("bigint").as("n_ips"))
      .orderBy("doc_id")
      .limit(2000)
  }

  /** RAG-style document chunking — fixed 64-token windows on a 48-token
    * stride (16-token overlap between consecutive chunks), the retrieval-
    * ingestion staple. Chunks start at stride multiples while start <
    * n_tokens; the last chunk simply runs short. Output is the chunk MAP
    * (doc, chunk_id, start, length) — the thing a planner shuffles and
    * joins — not the chunk text (a projection of the map against the doc,
    * kept off the wire on purpose).
    *
    * Scale stance: pure narrow arithmetic — one split for the token count,
    * one bounded posexplode (n_tok/48 rows per doc); no shuffle until the
    * display sort. All integer math, so the DuckDB twin matches exactly. */
  def q_text_chunk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), col("n_tok"),
        posexplode(sequence(lit(0), expr("(n_tok + 47) div 48") - 1)))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        (col("pos") * 48).cast("int").as("start_tok"),
        least(lit(64), col("n_tok") - col("pos") * 48).cast("int").as("n_chunk_tok"))
      .orderBy("doc_id", "chunk_id")
      .limit(5000)

  /** Per-document TF-IDF top terms — the keyword/feature-extraction staple
    * (smooth idf: ln((N+1)/(df+1)) + 1, sklearn's convention). Output: each
    * doc's top-3 tokens by (rounded score desc, token asc).
    *
    * Scale stance: tf is one explode → partial-agg groupBy(doc, tok); df
    * is a groupBy(tok) over the already-collapsed tf relation (never the
    * raw token stream); N rides along as a broadcast single-row cross
    * join (the scalar-subquery pattern, not a collected driver value);
    * the top-3 window partitions by doc_id — millions of small groups
    * distribute, nothing global. Ranking uses the ROUNDED score so both
    * engines cut ties identically (raw doubles can differ in the last
    * ulp across libm implementations; ties then break on token). */
  def q_text_tfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok").asc)
    tf.join(df, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("score").desc, col("tok"))
      .limit(3000)
  }

  /** Bigram language-model quality score — the perplexity-filter stage of
    * a pretraining pipeline (CCNet/RedPajama rank documents by an n-gram
    * LM's per-token log-prob and drop the tail): per document, the mean
    * natural-log probability of its bigrams under an add-1-smoothed
    * bigram model, P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V). The model here is
    * trained on the CORPUS ITSELF (the deterministic offline analog —
    * production swaps in counts from a held-out reference corpus, same
    * dataflow), so the score reads as "how typical is this document of
    * the corpus"; outliers (noise, wrong-language, boilerplate-free
    * gibberish) sit in the low tail.
    *
    * Fully oracle-checked: every log argument is a ratio of exact
    * integer counts, identical in both engines; only the final mean
    * crosses float-sum order, rounded to the 1e-6 grid (the corr-class
    * convention).
    *
    * Scale stance: the bigram extraction is the native NgramStrings
    * kernel (one pass, no HOF interpretation); counts are two partial-agg
    * groupBys over the bigram stream; V rides a broadcast single-row
    * cross join; scoring is one hash join per count table keyed by the
    * bigram/context string, then a per-doc partial-agg mean. Nothing
    * global, nothing driver-side, model tables shuffle-joined (a 100 TB
    * corpus's bigram vocabulary outgrows any broadcast). */
  def q_text_lm_score(s: SparkSession, d: String): DataFrame =
    lmScoreOf(Tables.documents(s, d))

  /** Core of [[q_text_lm_score]] over any (doc_id, text) frame —
    * separated so specs can hand-check the smoothing arithmetic on a
    * tiny fixture. Docs with <2 tokens have no bigrams and emit no row. */
  private[graft] def lmScoreOf(docs: DataFrame): DataFrame = {
    val bg = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHash.ngramArr(col("text"), 2)).as("bg"))
    val cBg = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    // context count = occurrences of w1 as a bigram head (positions 1..n-1)
    val cCtx = bg.select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab"))
    bg.join(cBg, Seq("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(cCtx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((col("c2") + lit(1.0)) / (col("c1") + col("vocab"))).as("logp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 6).as("avg_logp"))
      .orderBy("doc_id")
  }
}
