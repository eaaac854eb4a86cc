package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

/** Multimodal plumbing invariants: the stub decode is deterministic and the
  * Spark-side schema/partition/batch shapes are real even though the codec
  * is faked (brief: stub the decode, make the plumbing real and tested).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("media table has binary payload + typed metadata struct") {
    val m = MultimodalOps.mediaTable(s, sf)
    assert(m.schema("media").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    val kinds = m.select(col("meta.kind")).distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("stub features: L1-normalized histogram, n_bytes matches payload") {
    // output is exploded (media_id, n_bytes, bin, value) scalar rows
    val rows = MultimodalOps.q_multimodal_features(s, sf)
      .limit(50 * MultimodalOps.FEATURE_DIM).collect()
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_.getLong(0))
    perDoc.foreach { case (_, bins) =>
      assert(bins.length == MultimodalOps.FEATURE_DIM)
      val total = bins.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-3, s"histogram not normalized: $total")
      assert(bins.forall(_.getInt(1) > 0))
    }
    // deterministic across runs
    val again = MultimodalOps.q_multimodal_features(s, sf)
      .limit(50 * MultimodalOps.FEATURE_DIM).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("frame sampling yields fixed-size frames with ordinal numbering") {
    val frames = MultimodalOps.frameSample(MultimodalOps.mediaTable(s, sf))
    val r = frames.agg(
      min(length(col("frame"))), max(length(col("frame"))), min(col("frame_no"))).collect()(0)
    assert(r.getInt(0) == 16 && r.getInt(1) == 16 && r.getInt(2) == 0)
  }

  test("resize bounds payload size") {
    val resized = MultimodalOps.resizeStub(MultimodalOps.mediaTable(s, sf), 32)
    assert(resized.agg(max(length(col("media")))).collect()(0).getInt(0) <= 32)
  }

  test("WavCodec: hand-built byte-level WAV decodes to exact known samples") {
    import graft.multimodal.WavCodec
    // 44-byte canonical header + 3 mono samples, written BY HAND (not via
    // encodePcm16 — guards against a co-bug in encoder and decoder)
    val buf = java.nio.ByteBuffer.allocate(50)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(42)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(6)
      .putShort(1000).putShort(-2).putShort(Short.MinValue)
    val w = WavCodec.decode(buf.array()).get
    assert(w.channels == 1 && w.sampleRate == 8000 && w.bitsPerSample == 16)
    assert(w.samples.toSeq == Seq[Short](1000, -2, Short.MinValue))
  }

  test("WavCodec: encode/decode round-trip, unknown chunks skipped, garbage rejected") {
    import graft.multimodal.WavCodec
    val samples = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 12345)
    val bytes = WavCodec.encodePcm16(samples, 44100, 2)
    val w = WavCodec.decode(bytes).get
    assert(w.channels == 2 && w.sampleRate == 44100)
    assert(w.samples.toSeq == samples.toSeq)
    // an unknown chunk (odd length -> padded) before data must be skipped
    val withJunk = {
      val junk = java.nio.ByteBuffer.allocate(9 + 1)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      junk.put("LIST".getBytes("US-ASCII")).putInt(1).put(7.toByte).put(0.toByte)
      val (head, tail) = bytes.splitAt(36) // after the fmt chunk
      val out = head ++ junk.array() ++ tail.drop(0)
      // fix the RIFF size field (not checked by decode, but keep it honest)
      out
    }
    val w2 = WavCodec.decode(withJunk).get
    assert(w2.samples.toSeq == samples.toSeq)
    // rejects: truncation mid-data, wrong magic, non-PCM format, null
    assert(WavCodec.decode(bytes.dropRight(3)).isEmpty)
    assert(WavCodec.decode("JUNK".getBytes ++ bytes.drop(4)).isEmpty)
    val nonPcm = bytes.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(WavCodec.decode(nonPcm).isEmpty)
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("BmpCodec: hand-built byte-level BMP decodes to exact known pixels") {
    import graft.multimodal.BmpCodec
    // 2x2, 24-bit, BOTTOM-UP rows with 2-byte stride padding (2*3=6 -> 8),
    // written BY HAND: bottom row = [blue, green], top row = [red, white]
    val buf = java.nio.ByteBuffer.allocate(14 + 40 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(70).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24).putInt(0)
      .putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // pixel data: rows are BGR + padding; FIRST stored row is the BOTTOM row
    buf.put(Array[Byte](-1, 0, 0, 0, -1, 0, 0, 0))          // blue, green, pad
    buf.put(Array[Byte](0, 0, -1, -1, -1, -1, 0, 0))        // red, white, pad
    val img = BmpCodec.decode(buf.array()).get
    assert(img.width == 2 && img.height == 2)
    // decoded TOP-DOWN: red, white / blue, green
    assert(img.pixels.toSeq == Seq(0xFF0000, 0xFFFFFF, 0x0000FF, 0x00FF00))
  }

  test("BmpCodec: encode/decode round-trip with odd width (stride padding), garbage rejected") {
    import graft.multimodal.BmpCodec
    // width 3 -> row 9 bytes -> stride 12: padding exercised every row
    val px = Array(0x123456, 0x000000, 0xFFFFFF, 0x804020, 0x0000FF, 0x00FF00)
    val bytes = BmpCodec.encodeBmp24(3, 2, px)
    val img = BmpCodec.decode(bytes).get
    assert(img.width == 3 && img.height == 2)
    assert(img.pixels.toSeq == px.toSeq)
    // top-down (negative height) variant decodes to the same top-down pixels
    val neg = bytes.clone()
    val nb = java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nb.putInt(22, -2) // height := -2 -> rows stored top-down
    // swap the two stored rows so the image content stays identical
    val stride = 12
    val r0 = neg.slice(54, 54 + stride)
    System.arraycopy(neg, 54 + stride, neg, 54, stride)
    System.arraycopy(r0, 0, neg, 54 + stride, stride)
    assert(BmpCodec.decode(neg).get.pixels.toSeq == px.toSeq)
    // rejects: truncation, wrong magic, 32 bpp, compressed, null
    assert(BmpCodec.decode(bytes.dropRight(1)).isEmpty)
    assert(BmpCodec.decode("XY".getBytes ++ bytes.drop(2)).isEmpty)
    val b32 = bytes.clone(); b32(28) = 32; assert(BmpCodec.decode(b32).isEmpty)
    val brle = bytes.clone(); brle(30) = 1; assert(BmpCodec.decode(brle).isEmpty)
    assert(BmpCodec.decode(null).isEmpty)
    assert(BmpCodec.decode(Array[Byte]('B', 'M', 1)).isEmpty)
  }

  test("q_multimodal_image: every synthetic BMP decodes; dims and channel means exact") {
    import graft.multimodal.{MultimodalOps => M, BmpCodec}
    val out = M.q_multimodal_image(s, sf).collect()
    val nDocs = Tables.documents(s, sf).count()
    assert(out.length == nDocs, s"decode dropped rows: ${out.length} of $nDocs")
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") == 8 + (id % 16).toInt)
      assert(r.getAs[Int]("height") == 8 + (id % 8).toInt)
      assert(r.getAs[Long]("n_pixels") ==
        r.getAs[Int]("width").toLong * r.getAs[Int]("height"))
      Seq("mean_r", "mean_g", "mean_b").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 255.0, s"$c out of range: $r")
      }
    }
    // spot-check exact means against a direct local decode of the same synth
    val id = out(0).getAs[Long]("media_id")
    val (w, h) = (8 + (id % 16).toInt, 8 + (id % 8).toInt)
    val img = BmpCodec.decode(BmpCodec.encodeBmp24(w, h, M.synthPixels(id, w * h))).get
    val sr = img.pixels.map(p => ((p >> 16) & 0xFF).toLong).sum
    assert(out(0).getAs[Double]("mean_r") ==
      math.rint(sr * 1e6 / img.pixels.length) / 1e6)
  }

  test("AviCodec: container round-trip preserves frames byte-for-byte; garbage rejected") {
    import graft.multimodal.AviCodec
    val frames = Seq(
      Array[Byte](1, 2, 3),                  // odd length -> pad byte exercised
      Array[Byte](4, 5, 6, 7),
      Array.fill[Byte](64)(-1))
    val bytes = AviCodec.encodeAvi(320, 240, frames, fps = 30)
    val v = AviCodec.decode(bytes).get
    assert(v.width == 320 && v.height == 240 && v.frames.length == 3)
    assert(v.compression != 0, "stub fourcc must not read as BI_RGB")
    frames.zip(v.frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    // rejects: truncation, wrong magic, WAV bytes (RIFF but not AVI), null
    assert(AviCodec.decode(bytes.dropRight(5)).isEmpty)
    assert(AviCodec.decode("JUNK".getBytes ++ bytes.drop(4)).isEmpty)
    val wav = graft.multimodal.WavCodec.encodePcm16(Array[Short](1, 2), 8000, 1)
    assert(AviCodec.decode(wav).isEmpty)
    assert(AviCodec.decode(null).isEmpty)
    // frame-count mismatch between header and movi chunks is rejected
    val lied = bytes.clone()
    val lb = java.nio.ByteBuffer.wrap(lied).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // avih dwTotalFrames: 12 (RIFF hdr) + 8 (LIST id+size) + 4 ('hdrl')
    // + 8 ('avih'+len) + 16 (four fields) = offset 48
    lb.putInt(48, 99)
    assert(AviCodec.decode(lied).isEmpty)
  }

  test("q_multimodal_video: every synthetic AVI decodes to pixels; sampling and stats exact") {
    import graft.multimodal.{MultimodalOps => M, AviCodec}
    val out = M.q_multimodal_video(s, sf).collect()
    val nDocs = Tables.documents(s, sf).count()
    assert(out.length == nDocs, s"frame decode dropped rows: ${out.length} of $nDocs")
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (w, h) = M.videoDims(M.videoFamilyKey(id))
      assert(r.getAs[Int]("width") == w)
      assert(r.getAs[Int]("height") == h)
      val nf = r.getAs[Long]("n_frames")
      assert(nf == 4 + (id % 8), s"frame count wrong: $r")
      assert(r.getAs[Long]("n_sampled") == (nf + 1) / 2, s"stride-2 sample wrong: $r")
      // DIB payload size is exact: stride * height
      val stride = (w * 3 + 3) & ~3
      assert(r.getAs[Double]("avg_frame_bytes") == stride.toDouble * h)
      Seq("mean_r", "mean_g", "mean_b").foreach { c =>
        val m = r.getAs[Double](c)
        assert(m >= 0.0 && m <= 255.0, s"$c out of range: $r")
      }
    }
    // spot-check one row's channel means against a direct local decode of
    // the same synthetic media (full round-trip: pixels -> DIB frames ->
    // AVI -> parse -> pixel decode -> stats)
    val id = out(0).getAs[Long]("media_id")
    val local = AviCodec.decode(M.synthVideoRow(id).media).get
    assert(local.compression == 0)
    val sampled = local.frames.indices.by(2).map(local.frames)
    val px = sampled.flatMap(f =>
      AviCodec.decodeDibFrame(f, local.width, local.height).get)
    val expR = math.rint(px.map(p => ((p >> 16) & 0xFF).toLong).sum * 1e6 / px.length) / 1e6
    assert(out(0).getAs[Double]("mean_r") == expR)
    assert(out(0).getAs[Long]("n_frames") == local.frames.length)
  }

  test("DIB frame codec: known pixels survive the full AVI round-trip; padding is pixel-invisible") {
    import graft.multimodal.{MultimodalOps => M, AviCodec}
    // 3x2, odd width -> 1-byte row padding; known pixel values
    val pixels = Array(0xFF0000, 0x00FF00, 0x0000FF, 0x102030, 0xFFFFFF, 0x000000)
    val f1 = AviCodec.encodeDibFrame(3, 2, pixels, padSeed = 1L)
    val f2 = AviCodec.encodeDibFrame(3, 2, pixels, padSeed = 2L)
    // different padding garbage -> byte-different payloads...
    assert(!f1.sameElements(f2))
    // ...that decode to the SAME pixels
    assert(AviCodec.decodeDibFrame(f1, 3, 2).get.toSeq == pixels.toSeq)
    assert(AviCodec.decodeDibFrame(f2, 3, 2).get.toSeq == pixels.toSeq)
    // wrong dims / truncation quarantine (width 4 would tile the same 24
    // bytes — stride rounding makes that ambiguity inherent — so use a
    // width whose stride cannot)
    assert(AviCodec.decodeDibFrame(f1, 5, 2).isEmpty)
    assert(AviCodec.decodeDibFrame(f1.dropRight(1), 3, 2).isEmpty)
    // through the container: BI_RGB compression recorded, frames verbatim
    val v = AviCodec.decode(AviCodec.encodeAvi(3, 2, Seq(f1, f2),
      codec = AviCodec.DIB)).get
    assert(v.compression == 0)
    assert(AviCodec.decodeDibFrame(v.frames(0), v.width, v.height).get.toSeq == pixels.toSeq)
    // the fingerprint is over DECODED pixels: byte-different encodes agree
    assert(M.frameFingerprint(v, v.frames(0)) == M.frameFingerprint(v, v.frames(1)))
  }

  test("frame-dedup existence variant: superset of the counted pairs; finds 1-shared-frame pairs") {
    import graft.multimodal.{MultimodalOps => M, AviCodec}
    // contract on the real lake: existence pairs ⊇ counted pairs projected
    val full = M.q_multimodal_frame_dedup(s, sf).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    val exists = M.q_multimodal_frame_dedup_exists(s, sf).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(full.subsetOf(exists),
      s"existence dropped counted pairs: ${(full -- exists).take(5)}")
    // the difference the ≥2 rule is ABOUT: a pair sharing exactly ONE
    // frame appears in the existence set only
    def frame(k: Int) = AviCodec.encodeDibFrame(3, 2,
      Array.fill(6)(k * 0x010101), padSeed = k)
    def avi(id: Long, ks: Int*) = M.VideoRow(id,
      AviCodec.encodeAvi(3, 2, ks.map(frame), codec = AviCodec.DIB))
    val tiny = s.createDataFrame(Seq(
      avi(1L, 10, 11), avi(2L, 10, 12),     // share exactly frame 10
      avi(3L, 20, 21), avi(4L, 20, 21)))    // share two frames
    val fullTiny = M.frameDedupPairs(tiny).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    val existsTiny = M.frameDedupExistencePairs(tiny).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(fullTiny == Set((3L, 4L)))
    assert(existsTiny == Set((1L, 2L), (3L, 4L)))
  }

  test("non-DIB fallback: raw-payload fingerprints dedup byte-identical re-muxes, quarantine nothing") {
    import graft.multimodal.{MultimodalOps => M, AviCodec}
    // compressed-codec frame payloads: opaque bytes, NOT valid 3x2 DIB rows
    // (odd lengths on purpose — the decoder must not try to tile them)
    def payload(k: Int) = Array.tabulate[Byte](13 + k % 5)(i => (i * 31 + k).toByte)
    def avi(id: Long, fps: Int, ks: Int*) = M.VideoRow(id,
      AviCodec.encodeAvi(3, 2, ks.map(payload), fps = fps, codec = "mjpg"))
    // 1 & 2: SAME frame payloads at different fps — a re-mux whose container
    // bytes differ but frame bytes match; 3 shares exactly one frame with
    // each; 4 is fully disjoint
    val rows = Seq(avi(1L, 25, 10, 11), avi(2L, 30, 10, 11),
      avi(3L, 25, 10, 90), avi(4L, 25, 50, 51))
    assert(!rows(0).media.sameElements(rows(1).media), "containers must differ")
    // every stream parses (no quarantine) and records a non-BI_RGB codec —
    // the branch frameFingerprint answers with the raw-payload hash
    rows.foreach { r =>
      val v = AviCodec.decode(r.media)
      assert(v.isDefined, s"media ${r.media_id} quarantined")
      assert(v.get.compression != 0)
    }
    val df = s.createDataFrame(rows)
    val full = M.frameDedupPairs(df).collect()
    assert(full.map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
      == Set((1L, 2L)), s"expected only the re-mux pair: ${full.toSeq}")
    assert(full.head.getAs[Long]("n_shared_frames") == 2L)
    val exists = M.frameDedupExistencePairs(df).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(exists == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("frame dedup finds pixel-identical re-encodes that raw-byte hashing would miss") {
    import graft.multimodal.{MultimodalOps => M}
    // two same-family ids: pixel-identical frames, byte-different payloads
    // (id-keyed padding); one cross-family id as the negative
    val rows = Seq(M.synthVideoRow(40L), M.synthVideoRow(41L), M.synthVideoRow(90L))
    // byte layouts genuinely differ within the family
    assert(!rows(0).media.sameElements(rows(1).media))
    val pairs = M.frameDedupPairs(s.createDataFrame(rows)).collect()
    assert(pairs.length == 1, s"expected exactly the family pair: ${pairs.toSeq}")
    assert(pairs(0).getAs[Long]("media_a") == 40L && pairs(0).getAs[Long]("media_b") == 41L)
    assert(pairs(0).getAs[Long]("n_shared_frames") ==
      math.min(4 + (40L % 8), 4 + (41L % 8)))
  }

  test("q_multimodal_frame_dedup: re-muxed families found by shared frames, exact overlap counts") {
    import graft.multimodal.{MultimodalOps => M}
    val out = M.q_multimodal_frame_dedup(s, sf).collect()
    assert(out.nonEmpty)
    val nDocs = Tables.documents(s, sf).count()
    // ids sharing id / 10 (consecutive groups of 10) share frame content;
    // frame counts are 4 + id % 8,
    // so a family pair (a, b) shares exactly min(nf_a, nf_b) frames — and
    // NO cross-family pair shares anything
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))
      assert(M.videoFamilyKey(a) == M.videoFamilyKey(b),
        s"cross-family pair proposed: $r")
      val expected = math.min(4 + (a % 8), 4 + (b % 8))
      assert(r.getAs[Long]("n_shared_frames") == expected,
        s"overlap wrong (expected $expected): $r")
    }
    // completeness: every same-family pair is present (the per-frame-hash
    // df at this corpus size stays within the [2, 20] blocking band)
    val ids = Tables.documents(s, sf).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.length == nDocs)
    val expectedPairs = ids.groupBy(M.videoFamilyKey).values
      .flatMap(g => g.sorted.combinations(2).map(p => (p(0), p(1)))).size
    assert(out.length == expectedPairs,
      s"expected $expectedPairs family pairs, got ${out.length}")
  }

  test("q_multimodal_audio: every synthetic WAV decodes; stats are exact and deterministic") {
    import graft.multimodal.{MultimodalOps => M, WavCodec}
    val out = M.q_multimodal_audio(s, sf).collect()
    val nDocs = Tables.documents(s, sf).count()
    assert(out.length == nDocs, s"decode dropped rows: ${out.length} of $nDocs")
    out.foreach { r =>
      assert(r.getAs[Int]("sample_rate") == 8000 && r.getAs[Int]("n_channels") == 1)
      val n = r.getAs[Long]("n_samples")
      assert(n >= 64 && n < 192, s"sample count out of range: $r")
      val (rms, peak) = (r.getAs[Double]("rms"), r.getAs[Double]("peak"))
      assert(rms > 0.0 && rms <= peak && peak <= 1.0, s"stats out of range: $r")
    }
    // spot-check one row against a direct local decode of the same synth
    val id = out(0).getAs[Long]("media_id")
    val local = WavCodec.decode(WavCodec.encodePcm16(
      M.synthSamples(id, 64 + (id % 128).toInt), 8000, 1)).get
    assert(out(0).getAs[Long]("n_samples") == local.samples.length)
    // deterministic across runs
    val again = M.q_multimodal_audio(s, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
