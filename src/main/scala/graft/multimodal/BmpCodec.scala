package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM 24-bit BMP codec — the image counterpart of [[WavCodec]]: with
  * WAV covering audio, this makes two of the three modalities REAL decode
  * paths (video stays an honest stub; no container/codec library exists
  * in this environment that could make it real).
  *
  * Supports the plain uncompressed format: BITMAPFILEHEADER (14 bytes) +
  * BITMAPINFOHEADER (40 bytes), BI_RGB, 24 bits per pixel, rows padded to
  * 4 bytes. Positive height = bottom-up row order (the common case),
  * negative = top-down; both decode to top-down pixels. Anything else —
  * palettes, compression, 1/4/8/16/32 bpp, truncated buffers — returns
  * None rather than throwing (quarantine semantics, same contract as
  * WavCodec).
  */
object BmpCodec {

  /** Decoded image: `pixels` row-major TOP-DOWN, each 0xRRGGBB. */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int])

  private val FILE_HEADER = 14
  private val INFO_HEADER = 40

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Canonical bottom-up 24-bit BMP bytes for top-down 0xRRGGBB pixels. */
  def encodeBmp24(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims: ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels do not tile ${width}x$height")
    val stride = rowStride(width)
    val dataLen = stride * height
    val buf = ByteBuffer.allocate(FILE_HEADER + INFO_HEADER + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(FILE_HEADER + INFO_HEADER + dataLen)
      .putShort(0).putShort(0)
      .putInt(FILE_HEADER + INFO_HEADER) // pixel data offset
    buf.putInt(INFO_HEADER).putInt(width).putInt(height)
      .putShort(1) // planes
      .putShort(24)
      .putInt(0) // BI_RGB
      .putInt(dataLen)
      .putInt(2835).putInt(2835) // 72 DPI
      .putInt(0).putInt(0)
    // bottom-up rows, BGR byte order, zero padding
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        buf.put((p & 0xFF).toByte)          // B
          .put(((p >> 8) & 0xFF).toByte)    // G
          .put(((p >> 16) & 0xFF).toByte)   // R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse 24-bit BI_RGB BMP bytes; None on anything else. Never throws. */
  def decode(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes == null || bytes.length < FILE_HEADER + INFO_HEADER) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    try {
      if (buf.get() != 'B'.toByte || buf.get() != 'M'.toByte) return None
      buf.getInt // declared file size; trust the actual buffer
      buf.getShort; buf.getShort
      val dataOffset = buf.getInt
      val infoSize = buf.getInt
      // any BITMAPINFOHEADER-or-later header starts with the same 40 fields
      if (infoSize < INFO_HEADER) return None
      val width = buf.getInt
      val rawHeight = buf.getInt
      val planes = buf.getShort
      val bpp = buf.getShort
      val compression = buf.getInt
      if (width < 1 || rawHeight == 0 || rawHeight == Int.MinValue ||
        planes != 1 || bpp != 24 || compression != 0) return None
      val height = math.abs(rawHeight)
      val topDown = rawHeight < 0
      val stride = rowStride(width)
      if (width > (Int.MaxValue - 3) / 3 ||
        height > Int.MaxValue / stride ||
        dataOffset < FILE_HEADER + INFO_HEADER ||
        dataOffset.toLong + stride.toLong * height > bytes.length) return None
      val pixels = new Array[Int](width * height)
      var row = 0
      while (row < height) {
        val srcY = if (topDown) row else height - 1 - row
        var pos = dataOffset + srcY * stride
        var x = 0
        while (x < width) {
          val b = bytes(pos) & 0xFF
          val g = bytes(pos + 1) & 0xFF
          val r = bytes(pos + 2) & 0xFF
          pixels(row * width + x) = (r << 16) | (g << 8) | b
          pos += 3
          x += 1
        }
        row += 1
      }
      Some(Bmp(width, height, pixels))
    } catch { case _: RuntimeException => None }
  }
}
