package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.VectorOps
object DotBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val v = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("embedding").cast("array<double>").as("v")).cache()
    v.count()
    val pairs = v.crossJoin(v.select(col("v").as("w"))).cache()
    pairs.count() // 2000x2000 = 4M 64-dim pairs
    for (r <- 1 to 2; (name, d) <- Seq(
        "hof" -> VectorOps.hofDot(col("v"), col("w")),
        "native" -> VectorOps.dot(col("v"), col("w")))) {
      val t0 = System.nanoTime()
      pairs.select(sum(d)).collect()
      println(f"DOTBENCH round$r $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
