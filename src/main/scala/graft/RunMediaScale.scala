package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.multimodal.{AviCodec, BmpCodec, MultimodalOps, WavCodec}

/** Multimodal scale run — the codec/dedup path at lake size: generate
  * `nMedia` REAL containers per modality (AVI / WAV / BMP, the same
  * synthesis as the declared lakes, driven off spark.range instead of the
  * documents table), then time
  *   (1) the map-only container parse + stats pass per modality, and
  *   (2) the frame-fingerprint dedup over the video lake, with the exact
  *       expected family-pair count asserted (families are known by
  *       construction — a wrong count is a correctness failure, not noise).
  *
  *   runMain graft.RunMediaScale [nMedia=1000000] [shufflePartitions]
  *
  * `shufflePartitions` (default = CPUs) is the lever for the dedup stage
  * at lake size: the pair pipeline shuffles O(frames) fingerprint rows
  * and O(pairs) pair rows, and 32 partitions of a 75M-row shuffle spill.
  */
object RunMediaScale {
  def main(args: Array[String]): Unit = {
    val nMedia = args.lift(0).map(_.toLong).getOrElse(1000000L)
    require(nMedia % 10 == 0, "nMedia must be a multiple of the family size 10")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        args.lift(1).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9

    def ids = spark.range(nMedia).select(col("id")).as[Long]

    // video: parse throughput, then the dedup with its known answer
    val videos = ids.mapPartitions(_.map(MultimodalOps.synthVideoRow)).toDF()
    val tV = System.nanoTime()
    val vStats = videos.as[MultimodalOps.VideoRow]
      .mapPartitions(_.flatMap(r => AviCodec.decode(r.media)))
      .map(v => (1L, v.frames.length.toLong,
        v.frames.map(_.length.toLong).sum))
      .toDF("n", "frames", "bytes")
      .agg(sum("n"), sum("frames"), sum("bytes")).collect()(0)
    val vSecs = (System.nanoTime() - tV) / 1e9
    println(f"[mediascale] AVI parse: ${vStats.getLong(0)} containers, " +
      f"${vStats.getLong(1)} frames, ${vStats.getLong(2)} payload bytes " +
      f"in $vSecs%.1f s (${vStats.getLong(0) / vSecs}%,.0f media/s)")
    require(vStats.getLong(0) == nMedia, "container parse dropped rows")

    val tD = System.nanoTime()
    val nPairs = MultimodalOps.frameDedupPairs(videos).count()
    val dSecs = (System.nanoTime() - tD) / 1e9
    val expected = (nMedia / 10) * 45
    println(f"[mediascale] frame dedup: $nPairs pairs in $dSecs%.1f s " +
      f"(expected $expected)")
    require(nPairs == expected,
      s"frame dedup wrong: $nPairs pairs, expected $expected")

    // audio: WAV decode throughput (map-only)
    val tA = System.nanoTime()
    val aStats = ids.mapPartitions { it =>
      it.map(id => MultimodalOps.AudioRow(id, WavCodec.encodePcm16(
        MultimodalOps.synthSamples(id, 64 + (id % 128).toInt), 8000, 1)))
    }.mapPartitions(_.flatMap(r => WavCodec.decode(r.media)))
      .map(w => (1L, w.samples.length.toLong))
      .toDF("n", "samples").agg(sum("n"), sum("samples")).collect()(0)
    val aSecs = (System.nanoTime() - tA) / 1e9
    println(f"[mediascale] WAV decode: ${aStats.getLong(0)} files, " +
      f"${aStats.getLong(1)} samples in $aSecs%.1f s " +
      f"(${aStats.getLong(0) / aSecs}%,.0f media/s)")
    require(aStats.getLong(0) == nMedia, "WAV decode dropped rows")

    // image: BMP decode throughput (map-only)
    val tI = System.nanoTime()
    val iStats = ids.mapPartitions { it =>
      it.map { id =>
        val w = 8 + (id % 16).toInt
        val h = 8 + (id % 8).toInt
        MultimodalOps.ImageRow(id,
          BmpCodec.encodeBmp24(w, h, MultimodalOps.synthPixels(id, w * h)))
      }
    }.mapPartitions(_.flatMap(r => BmpCodec.decode(r.media)))
      .map(b => (1L, b.pixels.length.toLong))
      .toDF("n", "px").agg(sum("n"), sum("px")).collect()(0)
    val iSecs = (System.nanoTime() - tI) / 1e9
    println(f"[mediascale] BMP decode: ${iStats.getLong(0)} images, " +
      f"${iStats.getLong(1)} pixels in $iSecs%.1f s " +
      f"(${iStats.getLong(0) / iSecs}%,.0f media/s)")
    require(iStats.getLong(0) == nMedia, "BMP decode dropped rows")
    println(f"[mediascale] TOTAL $secs%.1f s")
    spark.stop()
  }
}
