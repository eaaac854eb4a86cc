package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle+hash kernels for the text-dedup hot path.
  *
  * Why these exist: `q_minhash_lsh` and `q_text_fingerprint` were dominated
  * by building every 5-token shingle STRING through interpreted
  * higher-order functions — `transform(sequence(...), i =>
  * array_join(slice(tokens, i, 5), " "))` materializes ~5× the document's
  * bytes as new UTF8Strings, each element through a boxed lambda
  * interpreter (HOFs are never whole-stage-codegen'd). A variadic-xxhash64
  * rewrite was tried in round 5 and was 6× SLOWER — still interpreted.
  *
  * The kernel exploits a byte-level identity instead: with tokens =
  * `split(text, " ")` (single-space split, empty tokens preserved), the
  * joined shingle `array_join(slice(tokens, i, 5), " ")` is EXACTLY the
  * byte range of the original text from the start of token i to the end of
  * token i+4 — including any runs of empty tokens. 0x20 never occurs
  * inside a UTF-8 multibyte sequence, so one byte scan finds all token
  * boundaries, and each shingle is hashed IN PLACE from the text's own
  * backing bytes via Spark's XXH64 (bit-identical to the `xxhash64` SQL
  * function, seed 42) — zero copies, zero allocation beyond the output.
  * TextKernelsSpec pins bit-equality against the HOF formulation.
  */
object TextKernels {

  private val SEED = 42L // Spark's xxhash64 default seed

  /** Byte offsets where each token starts; returns (starts, count).
    * Token j spans [starts(j), starts(j+1) - 2 + 1) i.e. ends before the
    * space at starts(j+1)-1; the last token ends at numBytes. */
  private def tokenStarts(base: AnyRef, off: Long, len: Int): Array[Int] = {
    // worst case: all spaces → len+1 tokens
    var starts = new Array[Int](math.min(len + 2, 64))
    var n = 0
    def push(p: Int): Unit = {
      if (n == starts.length) starts = java.util.Arrays.copyOf(starts, starts.length * 2)
      starts(n) = p; n += 1
    }
    push(0)
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) push(i + 1)
      i += 1
    }
    push(len + 1) // sentinel: start of the would-be next token
    java.util.Arrays.copyOf(starts, n)
  }

  /** Per-band minima of xxhash64(band, shingle) over the doc's 5-token
    * shingles — the whole MinHash/LSH banding in one text pass. Returns
    * null when the doc has fewer than 5 tokens (no shingles), mirroring
    * the `size(tokens) >= 5` pre-filter of the HOF form. Band seed chain
    * matches xxhash64(lit(b), sh): lit(b) is an INT literal, so the chain
    * is hashInt(b, 42) then the string bytes. */
  def bandMins(s: UTF8String, nBands: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    val starts = tokenStarts(base, off, len)
    val nTokens = starts.length - 1
    if (nTokens < 5) return null
    val seeds = new Array[Long](nBands)
    var b = 0
    while (b < nBands) { seeds(b) = XXH64.hashInt(b, SEED); b += 1 }
    val mins = Array.fill(nBands)(Long.MaxValue)
    var i = 0
    while (i <= nTokens - 5) {
      val from = starts(i)
      val until = starts(i + 5) - 1 // strip the trailing space / sentinel
      b = 0
      while (b < nBands) {
        val h = XXH64.hashUnsafeBytes(base, off + from, until - from, seeds(b))
        if (h < mins(b)) mins(b) = h
        b += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** All g-token n-gram STRINGS of the text — the exact values
    * `transform(sequence(...), i => array_join(slice(tokens, i, g), " "))`
    * builds, but sliced directly out of the text's bytes in one loop (each
    * gram copied exactly once into its own UTF8String; the HOF form
    * allocates every token AND every join). Empty array when <g tokens. */
  def ngramArray(s: UTF8String, g: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    val starts = tokenStarts(base, off, len)
    val nTokens = starts.length - 1
    val n = math.max(nTokens - (g - 1), 0)
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      val from = starts(i)
      val until = starts(i + g) - 1
      // fromAddress is a VIEW over the text's buffer; clone() copies the
      // gram's bytes once so the value survives buffer reuse downstream
      out(i) = UTF8String.fromAddress(base, off + from, until - from).clone()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 5-token shingles — the dedup-pipeline specialization of [[ngramArray]]. */
  def shingleArray(s: UTF8String): ArrayData = ngramArray(s, 5)

  /** The k smallest xxhash64(shingle) values (ascending, multiset — equal
    * hashes kept, exactly like sort+slice of the full hash list) over the
    * doc's 5-token shingles; fewer than k when the doc has fewer shingles,
    * empty when it has none. The winnowing-style sketch of
    * q_text_fingerprint. */
  def smallestK(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    val starts = tokenStarts(base, off, len)
    val nTokens = starts.length - 1
    val nSh = math.max(nTokens - 4, 0)
    val keep = math.min(k, nSh)
    val best = Array.fill(keep max 1)(Long.MaxValue)
    var i = 0
    while (i <= nTokens - 5) {
      val from = starts(i)
      val until = starts(i + 5) - 1
      val h = XXH64.hashUnsafeBytes(base, off + from, until - from, SEED)
      if (keep > 0 && h < best(keep - 1)) {
        // insertion into the tiny sorted buffer
        var j = keep - 1
        while (j > 0 && best(j - 1) > h) { best(j) = best(j - 1); j -= 1 }
        best(j) = h
      }
      i += 1
    }
    new GenericArrayData(if (keep == 0) Array.emptyLongArray else best)
  }

  /** Seed of the SECOND hash of the 128-bit composite shingle key —
    * exactly the accumulated seed of `xxhash64(lit(1L), sh)` (Spark chains:
    * seed 42 → hashLong(1L) → then the string bytes), kept so the kernel
    * is bit-identical to that expression form (pinned in TextKernelsSpec).
    * Unlike r17's `xxhash64(sh, lit(1L))` — where h2 was a pure function
    * of h1 (h2 = hashLong(1L, seed = h1), i.e. the "128-bit" key was
    * really 64-bit: any h1 collision collided the whole struct) — hashing
    * the salt FIRST gives two genuinely independent passes over the
    * shingle bytes with different seeds. */
  private val SEED2 = XXH64.hashLong(1L, SEED)

  /** Per-document DISTINCT 128-bit hashed g-token n-grams, straight off
    * the text bytes: for each n-gram byte range (the [[ngramArray]]
    * identity — token i start .. token i+g−1 end), h1 = XXH64(range, 42)
    * and h2 = XXH64(range, [[SEED2]]), deduplicated with an open-addressed
    * probe table before emission. No n-gram STRING is ever materialized,
    * and because the output is already distinct per document (and doc ids
    * are unique), consumers that previously ran `.distinct()` over the
    * exploded (doc_id, shingle) relation need no exchange at all.
    * Returns ARRAY<STRUCT<h1,h2>> (empty when the doc has <g tokens, so
    * `explode` drops the doc exactly like the old empty-array form).
    * Emission order is first-occurrence order — callers treat the result
    * as a set (grouping/join keys only). */
  def hashedNgramSet(s: UTF8String, g: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    val starts = tokenStarts(base, off, len)
    val nTokens = starts.length - 1
    val n = math.max(nTokens - (g - 1), 0)
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    // open-addressed table sized 2x the n-gram count (power of two)
    var cap = 4
    while (cap < n * 2) cap <<= 1
    val mask = cap - 1
    val t1 = new Array[Long](cap)
    val t2 = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val from = starts(i)
      val until = starts(i + g) - 1
      val h1 = XXH64.hashUnsafeBytes(base, off + from, until - from, SEED)
      val h2 = XXH64.hashUnsafeBytes(base, off + from, until - from, SEED2)
      var slot = (h1 ^ (h1 >>> 32)).toInt & mask
      var dup = false
      while (used(slot) && !dup) {
        if (t1(slot) == h1 && t2(slot) == h2) dup = true
        else slot = (slot + 1) & mask
      }
      if (!dup) {
        used(slot) = true; t1(slot) = h1; t2(slot) = h2
        out(m) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](h1, h2))
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  // one MD5 instance per task thread, reset per token — getInstance per
  // token would dominate the pass
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Whole-document SimHash band buckets in one byte pass: tokenize on
    * single spaces (empty tokens preserved — identical to `split(text,
    * " ")`), MD5 each token's UTF-8 bytes, and for signature bit j
    * (nibble j/4 of the hex digest, bit j%4 of that nibble — the exact
    * bit order of the expression form this replaced) count tokens with
    * the bit set; fingerprint bit j = (+1/−1 sign sum ≥ 0) ⇔
    * 2·nset_j ≥ n_tokens, all integer. Returns ARRAY<BIGINT>(nBands)
    * where band b packs its bandBits fingerprint bits as Σ bit·2^r —
    * bit-identical buckets to the 64-agg-buffer groupBy formulation
    * (pinned in TextKernelsSpec), but with NO row expansion and NO
    * aggregation shuffle: the per-doc state lives in one 64-int array
    * instead of 64 codegen'd sum() buffers across an exchange. */
  def simhashBands(s: UTF8String, nBands: Int, bandBits: Int): ArrayData = {
    require(nBands * bandBits <= 64, "MD5 prefix provides 64 signature bits")
    val nBits = nBands * bandBits
    val bytes = s.getBytes // contiguous view or one copy; MD5 needs byte[]
    val len = bytes.length
    val md = md5Local.get()
    val nset = new Array[Int](nBits)
    var nTokens = 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val dig = md.digest()
        var j = 0
        while (j < nBits) {
          val p = j >> 2 // hex-char position in the digest's hex string
          val b = dig(p >> 1)
          val v = if ((p & 1) == 0) (b >> 4) & 0xF else b & 0xF
          nset(j) += (v >>> (j & 3)) & 1
          j += 1
        }
        nTokens += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](nBands)
    var band = 0
    while (band < nBands) {
      var acc = 0L
      var r = 0
      while (r < bandBits) {
        if (2 * nset(band * bandBits + r) >= nTokens) acc |= (1L << r)
        r += 1
      }
      out(band) = acc
      band += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait ShingleHashExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
}

/** Native MinHash band minima: ARRAY<BIGINT>(nBands), null when <5 tokens. */
case class ShingleBandMins(child: Expression, nBands: Int) extends ShingleHashExpr {
  override def nullable: Boolean = true // null on shingle-less docs
  override def prettyName: String = "shingle_band_mins"
  override def nullSafeEval(s: Any): Any =
    TextKernels.bandMins(s.asInstanceOf[UTF8String], nBands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.TextKernels.bandMins($s, $nBands);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
    code
  }
  override protected def withNewChildInternal(c: Expression): ShingleBandMins =
    copy(child = c)
}

/** Native n-gram-string array: ARRAY<STRING> of the g-token grams. */
case class NgramStrings(child: Expression, g: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_strings"
  override def nullSafeEval(s: Any): Any =
    TextKernels.ngramArray(s.asInstanceOf[UTF8String], g)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.ngramArray($s, $g)")
  override protected def withNewChildInternal(c: Expression): NgramStrings =
    copy(child = c)
}

/** Native whole-doc SimHash band buckets: ARRAY<BIGINT>(nBands). */
case class SimHashBands(child: Expression, nBands: Int, bandBits: Int)
    extends ShingleHashExpr {
  override def prettyName: String = "simhash_bands"
  override def nullSafeEval(s: Any): Any =
    TextKernels.simhashBands(s.asInstanceOf[UTF8String], nBands, bandBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextKernels.simhashBands($s, $nBands, $bandBits)")
  override protected def withNewChildInternal(c: Expression): SimHashBands =
    copy(child = c)
}

/** Native per-doc-distinct 128-bit hashed g-gram keys:
  * ARRAY<STRUCT<h1:BIGINT,h2:BIGINT>> (empty when <g tokens). */
case class HashedNgramSet(child: Expression, g: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "hashed_ngram_set"
  override def nullSafeEval(s: Any): Any =
    TextKernels.hashedNgramSet(s.asInstanceOf[UTF8String], g)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.hashedNgramSet($s, $g)")
  override protected def withNewChildInternal(c: Expression): HashedNgramSet =
    copy(child = c)
}

/** Native k-smallest shingle hashes: ascending ARRAY<BIGINT> of ≤ k. */
case class ShingleMinK(child: Expression, k: Int) extends ShingleHashExpr {
  override def prettyName: String = "shingle_min_k"
  override def nullSafeEval(s: Any): Any =
    TextKernels.smallestK(s.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.smallestK($s, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleMinK =
    copy(child = c)
}

object ShingleHash {
  import org.apache.spark.sql.graftbridge.Bridge
  def bandMins(text: Column, nBands: Int): Column =
    Bridge.column(ShingleBandMins(Bridge.expression(text), nBands))
  def minK(text: Column, k: Int): Column =
    Bridge.column(ShingleMinK(Bridge.expression(text), k))
  def shingleArr(text: Column): Column =
    Bridge.column(NgramStrings(Bridge.expression(text), 5))
  def simhashBands(text: Column, nBands: Int, bandBits: Int): Column =
    Bridge.column(SimHashBands(Bridge.expression(text), nBands, bandBits))
  def ngramArr(text: Column, g: Int): Column =
    Bridge.column(NgramStrings(Bridge.expression(text), g))
  def hashedNgramSet(text: Column, g: Int): Column =
    Bridge.column(HashedNgramSet(Bridge.expression(text), g))
  /** 5-token specialization — the dedup pipelines' shingle key relation. */
  def hashedShingleSet(text: Column): Column = hashedNgramSet(text, 5)
}
