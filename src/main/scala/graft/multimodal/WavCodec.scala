package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM PCM WAV codec — the one REAL media codec in the multimodal
  * surface (no image/audio libraries ship in this container, so the other
  * modalities stay honestly-stubbed byte kernels; RIFF/WAVE PCM needs
  * nothing beyond ByteBuffer).
  *
  * Supports the plain canonical layout: RIFF header, a `fmt ` chunk with
  * audio format 1 (integer PCM) at 16 bits per sample, and a `data` chunk
  * of interleaved little-endian int16 frames. Unknown chunks (LIST, fact,
  * cue…) are skipped by their declared size, as the format requires.
  * Anything else — compressed formats, float PCM, 8/24-bit, truncated or
  * corrupt buffers — decodes to None rather than throwing: a 100 TB media
  * lake always contains garbage rows, and a decode stage that throws on
  * them kills the task instead of routing them to a quarantine column.
  */
object WavCodec {

  /** Decoded PCM audio: interleaved samples, frame count =
    * samples.length / channels. */
  final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      samples: Array[Short])

  /** Canonical 44-byte-header PCM16 WAV bytes for interleaved samples. */
  def encodePcm16(samples: Array[Short], sampleRate: Int, channels: Int): Array[Byte] = {
    require(channels >= 1 && channels <= 64, s"channels out of range: $channels")
    require(sampleRate >= 1, s"sampleRate out of range: $sampleRate")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Parse PCM16 WAV bytes; None on anything that is not plain PCM16 or is
    * structurally broken. Never throws. */
  def decode(bytes: Array[Byte]): Option[Wav] = {
    if (bytes == null || bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    try {
      if (tag() != "RIFF") return None
      buf.getInt // declared RIFF size; trust the actual buffer instead
      if (tag() != "WAVE") return None
      var channels = 0
      var sampleRate = 0
      var bits = 0
      var fmtSeen = false
      var out: Option[Wav] = None
      // walk chunks: fmt must precede data (the spec's ordering); skip others
      while (out.isEmpty && buf.remaining() >= 8) {
        val id = tag()
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        id match {
          case "fmt " =>
            if (len < 16) return None
            val p0 = buf.position()
            val audioFormat = buf.getShort
            channels = buf.getShort
            sampleRate = buf.getInt
            buf.getInt // byte rate
            buf.getShort // block align
            bits = buf.getShort
            if (audioFormat != 1 || bits != 16 || channels < 1 || sampleRate < 1)
              return None
            fmtSeen = true
            buf.position(p0 + len + (len & 1)) // chunks pad to even length
          case "data" =>
            if (!fmtSeen || len % 2 != 0 || len % (channels * 2) != 0) return None
            val n = len / 2
            val samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = buf.getShort; i += 1 }
            out = Some(Wav(channels, sampleRate, bits, samples))
          case _ =>
            buf.position(buf.position() + len + (len & 1))
        }
      }
      out
    } catch { case _: RuntimeException => None }
  }
}
