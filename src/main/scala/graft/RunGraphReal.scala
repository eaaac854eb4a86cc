package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps

/** Real-graph run of the non-factor community/structure operators: load a
  * whitespace edge list (the reference's own ingestion format), then CC,
  * fixed-round LPA, and the Newman-modularity bracket of the three
  * partitions (CC / LPA / mod-10 node-hash null). The modularity ordering
  * q(lpa) > q(mod10) on a real graph is the capability check for the
  * round-8 LPA op outside synthetic fixtures.
  *
  *   runMain graft.RunGraphReal <edgeListPath> [lpaRounds=5]
  */
object RunGraphReal {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunGraphReal <edgeListPath> [lpaRounds=5]")
    val path = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9
    val edges = GraphOps.symEdges(GraphOps.loadEdgeList(spark, path))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count()
    val nNodes = edges.select("src").distinct().count()
    println(f"[graphreal] $nNodes nodes, $nEdges directed edge rows ($secs%.0f s)")

    val tCc = System.nanoTime()
    val cc = GraphOps.connectedComponents(edges)
      .select(col("node"), col("comp").as("lab"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val comps = cc.groupBy("lab").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n"), max(col("sz")).as("giant")).collect()(0)
    println(f"[graphreal] CC: ${comps.getLong(0)} components, giant=${comps.getLong(1)} " +
      f"(${(System.nanoTime() - tCc) / 1e9}%.0f s)")

    val tLpa = System.nanoTime()
    val lpa = GraphOps.labelPropagation(edges, rounds)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lpaStats = lpa.groupBy("lab").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n"), max(col("sz")).as("biggest")).collect()(0)
    println(f"[graphreal] LPA($rounds): ${lpaStats.getLong(0)} labels, " +
      f"biggest=${lpaStats.getLong(1)} (${(System.nanoTime() - tLpa) / 1e9}%.0f s)")

    val hash = edges.select(col("src").as("node")).distinct()
      .select(col("node"), pmod(col("node"), lit(10L)).as("lab"))
    val bracket = GraphOps.modularity(edges, cc, "cc")
      .union(GraphOps.modularity(edges, lpa, "lpa"))
      .union(GraphOps.modularity(edges, hash, "mod10"))
      .orderBy("partition").collect()
    bracket.foreach(r => println(f"[graphreal] modularity ${r.getString(0)}%-6s " +
      f"n_parts=${r.getLong(1)} q=${r.getDouble(3)}%.6f"))
    println(f"[graphreal] total $secs%.0f s")
    spark.stop()
  }
}
