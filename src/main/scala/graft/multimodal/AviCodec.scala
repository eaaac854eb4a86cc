package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM AVI *container* codec — the video leg of the multimodal
  * surface. AVI is RIFF (the same chunk grammar as WAV): a `hdrl` LIST
  * holding the `avih` main header and one `strl` video stream, then a
  * `movi` LIST of `00dc` frame chunks. Parsing the container is real —
  * dimensions, frame count, every frame's byte range — which is exactly
  * what a frame-sampling pipeline stage needs; only the frame PAYLOAD
  * decode (the actual video codec) stays a stub, the honest boundary in
  * an environment with no codec libraries.
  *
  * Same quarantine contract as [[WavCodec]]/[[BmpCodec]]: anything
  * structurally broken or not a plain single-video-stream AVI returns
  * None, never throws.
  */
object AviCodec {

  /** Parsed container: frame payloads in stream order (opaque bytes —
    * whatever codec wrote them; `compression` is the strf biCompression
    * value, 0 = BI_RGB meaning the payloads are raw DIB pixel arrays
    * decodable by [[decodeDibFrame]]). */
  final case class Avi(width: Int, height: Int, compression: Int,
      frames: Vector[Array[Byte]])

  /** The BI_RGB "codec": raw device-independent-bitmap frames. */
  val DIB = "DIB "

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Canonical single-video-stream AVI holding the given frame payloads.
    * `fps` only affects the header timing fields. `codec` is written as
    * the stream handler fourcc; pass [[DIB]] for uncompressed 24-bit DIB
    * frames (biCompression is then BI_RGB = 0, the real uncompressed-AVI
    * convention an external reader understands). */
  def encodeAvi(width: Int, height: Int, frames: Seq[Array[Byte]],
      fps: Int = 25, codec: String = "grft"): Array[Byte] = {
    require(codec.length == 4, s"codec must be a fourcc: '$codec'")
    require(width >= 1 && height >= 1, s"bad dims: ${width}x$height")
    // rcFrame is written as int16; our decoder reads the avih ints, but an
    // external AVI reader would see wrapped garbage rects past 32767
    require(width <= Short.MaxValue && height <= Short.MaxValue,
      s"dims exceed rcFrame int16 range: ${width}x$height")
    require(frames.nonEmpty, "need at least one frame")
    require(fps >= 1, s"bad fps: $fps")
    def pad(n: Int) = n + (n & 1)
    val moviBody = frames.map(f => 8 + pad(f.length)).sum
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviList = 8 + 4 + moviBody
    val riffBody = 4 + (8 + hdrlBody) + moviList
    val buf = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(fourcc("RIFF")).putInt(riffBody).put(fourcc("AVI "))
    // hdrl LIST
    buf.put(fourcc("LIST")).putInt(hdrlBody).put(fourcc("hdrl"))
    val maxFrame = frames.map(_.length).max
    buf.put(fourcc("avih")).putInt(56)
      .putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(maxFrame * fps) // dwMaxBytesPerSec
      .putInt(0) // padding granularity
      .putInt(0) // flags
      .putInt(frames.length) // dwTotalFrames
      .putInt(0) // initial frames
      .putInt(1) // dwStreams
      .putInt(maxFrame) // suggested buffer
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    // strl LIST: strh + strf
    buf.put(fourcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).put(fourcc("strl"))
    buf.put(fourcc("strh")).putInt(56)
      .put(fourcc("vids")).put(fourcc(codec)) // stream type + handler
      .putInt(0).putShort(0).putShort(0) // flags, priority, language
      .putInt(0) // initial frames
      .putInt(1).putInt(fps) // scale, rate -> fps
      .putInt(0).putInt(frames.length) // start, length in frames
      .putInt(maxFrame).putInt(-1).putInt(0) // bufsize, quality, samplesize
      .putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort) // rcFrame
    buf.put(fourcc("strf")).putInt(40)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    if (codec == DIB) buf.putInt(0) // biCompression BI_RGB
    else buf.put(fourcc(codec)) // biCompression: the codec fourcc
    buf.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    // movi LIST
    buf.put(fourcc("LIST")).putInt(4 + moviBody).put(fourcc("movi"))
    frames.foreach { f =>
      buf.put(fourcc("00dc")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  /** Parse a single-video-stream AVI container; None on anything that is
    * not one, or is structurally broken. Never throws. Frame payloads come
    * back verbatim — decoding them is the (stubbed) codec's job. */
  def decode(bytes: Array[Byte]): Option[Avi] = {
    if (bytes == null || bytes.length < 24) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    try {
      if (tag() != "RIFF") return None
      buf.getInt
      if (tag() != "AVI ") return None
      var width = 0
      var height = 0
      var compression = -1
      var declaredFrames = -1
      var sawHdrl = false
      val frames = Vector.newBuilder[Array[Byte]]
      var nFrames = 0
      // walk top-level chunks; recurse one level into LIST hdrl/movi
      while (buf.remaining() >= 8) {
        val id = tag()
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        val end = buf.position() + len + (len & 1)
        if (id == "LIST" && len >= 4) {
          val listType = tag()
          listType match {
            case "hdrl" =>
              // scan the list body for avih (dims + frame count),
              // descending into nested LISTs (strl) by skipping their type
              while (buf.position() + 8 <= end) {
                val cid = tag()
                val clen = buf.getInt
                if (clen < 0) return None
                if (cid == "avih" && clen >= 40 && buf.position() + clen <= end) {
                  val q = buf.position()
                  buf.getInt; buf.getInt; buf.getInt; buf.getInt
                  declaredFrames = buf.getInt
                  buf.getInt; buf.getInt; buf.getInt
                  width = buf.getInt
                  height = buf.getInt
                  buf.position(q + clen + (clen & 1))
                } else if (cid == "strf" && clen >= 40 &&
                    buf.position() + clen <= end) {
                  // BITMAPINFOHEADER: biCompression at offset 16
                  val q = buf.position()
                  compression = buf.getInt(q + 16)
                  buf.position(q + clen + (clen & 1))
                } else if (cid == "LIST" && clen >= 4) {
                  buf.position(buf.position() + 4) // descend past list type
                } else {
                  if (buf.position() + clen > end) return None
                  buf.position(buf.position() + clen + (clen & 1))
                }
              }
              sawHdrl = true
              buf.position(end)
            case "movi" =>
              while (buf.position() + 8 <= end) {
                val cid = tag()
                val clen = buf.getInt
                if (clen < 0 || buf.position() + clen > end) return None
                if (cid == "00dc" || cid == "00db") {
                  val f = new Array[Byte](clen)
                  buf.get(f)
                  frames += f
                  nFrames += 1
                  if ((clen & 1) == 1) buf.get()
                } else {
                  buf.position(buf.position() + clen + (clen & 1))
                }
              }
              buf.position(end)
            case _ =>
              buf.position(end)
          }
        } else {
          buf.position(end)
        }
      }
      if (!sawHdrl || width < 1 || height < 1 || nFrames == 0) return None
      if (declaredFrames >= 0 && declaredFrames != nFrames) return None
      Some(Avi(width, height, compression, frames.result()))
    } catch { case _: RuntimeException => None }
  }

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Raw 24-bit DIB frame bytes for top-down 0xRRGGBB pixels: bottom-up
    * BGR rows padded to 4 bytes — exactly the payload an uncompressed
    * (BI_RGB) AVI frame chunk carries, i.e. a [[BmpCodec]] pixel array
    * without the file headers. `padSeed` fills the row-padding bytes
    * (which carry NO pixel information) deterministically, so two encodes
    * of the SAME pixels under different seeds are byte-DIFFERENT payloads
    * that decode identically — the re-encode case pixel-level
    * fingerprinting exists to catch. */
  def encodeDibFrame(width: Int, height: Int, pixels: Array[Int],
      padSeed: Long = 0L): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims: ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels do not tile ${width}x$height")
    val stride = rowStride(width)
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y // bottom-up
      var pos = y * stride
      var x = 0
      while (x < width) {
        val p = pixels(srcRow * width + x)
        out(pos) = (p & 0xFF).toByte
        out(pos + 1) = ((p >> 8) & 0xFF).toByte
        out(pos + 2) = ((p >> 16) & 0xFF).toByte
        pos += 3
        x += 1
      }
      var i = width * 3
      while (i < stride) {
        out(y * stride + i) = ((padSeed * 31L + y * 7L + i) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    out
  }

  /** Decode a raw 24-bit DIB frame payload (bottom-up BGR, 4-byte row
    * padding) to row-major top-down 0xRRGGBB pixels; None when the
    * payload does not tile the given dims. Never throws. */
  def decodeDibFrame(frame: Array[Byte], width: Int, height: Int): Option[Array[Int]] = {
    if (frame == null || width < 1 || height < 1) return None
    val stride = rowStride(width)
    if (stride.toLong * height != frame.length) return None
    val pixels = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      var pos = (height - 1 - row) * stride
      var x = 0
      while (x < width) {
        val b = frame(pos) & 0xFF
        val g = frame(pos + 1) & 0xFF
        val r = frame(pos + 2) & 0xFF
        pixels(row * width + x) = (r << 16) | (g << 8) | b
        pos += 3
        x += 1
      }
      row += 1
    }
    Some(pixels)
  }
}
