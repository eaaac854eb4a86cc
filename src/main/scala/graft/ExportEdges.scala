package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.GraphGen

/** Materialize a deterministic synthetic power-law graph as whitespace
  * edge-list text — the reference's input format (`GraphOps.loadEdgeList`
  * reads it back) — so the file-driven mains (RunBigClam, RunSelectK) can
  * run at any synthetic scale.
  *
  *   runMain graft.ExportEdges <nNodes> <nEdges> <outPath>
  */
object ExportEdges {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: ExportEdges <nNodes> <nEdges> <outPath>")
      sys.exit(2)
    }
    val Array(nNodes, nEdges) = args.take(2).map(_.toLong)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraphGen.powerLawEdges(spark, nNodes, nEdges)
      .select(concat_ws(" ", col("src"), col("dst")).as("value"))
      .write.mode("overwrite").text(args(2))
    println(s"[export] wrote $nNodes-node/$nEdges-draw power-law edge list to ${args(2)}")
    spark.stop()
  }
}
