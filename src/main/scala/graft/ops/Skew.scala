package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys — the manual fallbacks behind
  * Spark's AQE skew handling, for the cases AQE cannot fix:
  *
  *  - AQE's skew-join splitting only applies to sort-merge/shuffled-hash
  *    JOINS; a skewed AGGREGATION with a mega-key (one user with 10^9
  *    events in a 100 TB log) still funnels one reducer. `saltedAgg`
  *    two-phases it: groupBy(key, salt) partial → groupBy(key) final.
  *  - Broadcast-side salting for a skewed join is provided by
  *    `explodeSalt`: replicate the small side per salt value so the big
  *    side can join on (key, salt) and spread the hot key across
  *    `salts` reducers.
  *
  * Salt is deterministic (hash of stable columns mod salts), so results
  * stay reproducible — no rand() (SURVEY.md §2.c rule 4).
  */
object Skew {

  /** Deterministic salt in [0, salts) from the given columns. */
  def salt(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Two-phase aggregation over a skewed key: the caller supplies the
    * partial aggregates (per key+salt) and how to merge them (per key).
    * Example: count → partial count(*), merge sum. */
  def saltedAgg(df: DataFrame, key: Column, saltCols: Seq[Column], salts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.groupBy(key.as("skew_key"), salt(salts, saltCols: _*).as("skew_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("skew_key"))
      .agg(merge.head, merge.tail: _*)

  /** Replicate a (small) dimension once per salt value: join the fact side
    * on (key, salt(factRowCols)) = (key, salt_id) to fan a hot key out over
    * `salts` reducers. */
  def explodeSalt(dim: DataFrame, salts: Int): DataFrame =
    dim.withColumn("salt_id", explode(sequence(lit(0), lit(salts - 1))))
}
