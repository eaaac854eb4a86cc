package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata star schema.
  *
  * Every declared query receives `(SparkSession, sfDir)` and loads its
  * inputs through here, so filters/projections stay on top of a plain
  * parquet scan — Catalyst pushes predicates and prunes columns into the
  * vectorized reader (verify via `.explain("formatted")`: `PushedFilters`,
  * `ReadSchema`). At 100 TB the same call reads a partitioned parquet
  * lake; nothing here assumes single-file layout.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS, isAdjustedToUTC=0), which Spark's
    * reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong=true
    * and this loader converts the raw nanos to TIMESTAMP_NTZ (truncating to
    * micros, exactly what DuckDB does when it reads the same file). */
  private def fixNanoTs(df: DataFrame, colName: String): DataFrame =
    if (df.schema(colName).dataType == org.apache.spark.sql.types.LongType)
      df.withColumn(colName,
        org.apache.spark.sql.functions.expr(
          s"cast(timestamp_micros($colName div 1000) as timestamp_ntz)"))
    else df

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = fixNanoTs(table(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
