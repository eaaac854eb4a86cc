package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column ↔ catalyst Expression bridge. Spark 4 made these conversions
  * private[sql]; extension libraries shipping custom expressions need this
  * one-liner inside the sql package tree (the Column constructor took an
  * Expression directly in Spark ≤3.x).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager localCheckpoint with RESET statistics — the iterative-loop
    * lineage cut. Spark's (local)checkpoint carries the pre-checkpoint
    * plan's ESTIMATED stats onto the new LogicalRDD leaf (`originStats`),
    * and size-only join estimation multiplies child sizes, so a
    * checkpoint-per-round loop compounds sizeInBytes exponentially — by
    * round ~10 the driver multiplies million-digit BigIntegers inside
    * SizeInBytesOnlyStatsPlanVisitor while planning each job (found by the
    * BigCLAM 12-iteration robustness test). The historical fix re-wrapped
    * through `createDataFrame(cp.rdd, schema)`, which resets the leaf but
    * pays an InternalRow→Row→InternalRow round-trip on EVERY consumer scan
    * and erases the preserved output partitioning. This rebuilds the
    * LogicalRDD leaf directly: same internal-row RDD (no conversion), same
    * partitioning/ordering (loop joins keep their co-partitioning), fresh
    * default stats (no compounding). */
  def flatCheckpoint(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    val cp = df.localCheckpoint(true)
    cp.queryExecution.optimizedPlan match {
      case lr: LogicalRDD =>
        val session = cp.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        // SATURATE the inherited estimate rather than dropping it: a bare
        // reset (default sizeInBytes = Long.MaxValue) would veto broadcast
        // joins the real estimate correctly enables inside the loops,
        // while the unclamped inherited value is what compounds into
        // million-digit BigIntegers. Clamped at 2^62 the per-round stats
        // arithmetic stays word-sized forever.
        val cap = BigInt(Long.MaxValue / 2)
        val st = lr.stats
        val clamped = Statistics(
          sizeInBytes = st.sizeInBytes.min(cap),
          rowCount = st.rowCount.map(_.min(cap)))
        org.apache.spark.sql.classic.Dataset.ofRows(session,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            session, originStats = Some(clamped)))
      case _ => cp // not a bare checkpoint leaf — return as-is
    }
  }
}
