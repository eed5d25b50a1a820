package graft.functions

/** Decoded mono PCM16 clip. */
final case class DecodedClip(sampleRate: Int, samples: Array[Short])

/** Minimal RIFF/WAVE codec — encode and genuinely parse PCM16 mono
  * WAV (magic checks, chunk walk, little-endian fields). No external
  * audio library exists in this container, and none is needed: WAV is
  * a 44-byte header over raw samples, so the executor-side decode is
  * REAL (a truncated or byte-shifted payload fails loudly), which
  * keeps the q58 oracle gate load-bearing the same way ImageIO makes
  * q43/q44/q57 load-bearing.
  */
object AudioCodec {

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a PCM16 mono WAV; None when any magic/layout check fails. */
  def decodeWav(bytes: Array[Byte]): Option[DecodedClip] = {
    if (bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
    }
    if (ascii(4) != "RIFF") return None
    bb.getInt // declared riff size; chunk walk below is the authority
    if (ascii(4) != "WAVE") return None
    var rate = -1
    var data: Array[Short] = null
    while (bb.remaining >= 8) {
      val id = ascii(4)
      val len = bb.getInt
      if (len < 0 || len > bb.remaining) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmtEnd = bb.position() + len
          val codec = bb.getShort
          val channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          val bits = bb.getShort
          if (codec != 1 || channels != 1 || bits != 16) return None
          bb.position(fmtEnd)
        case "data" =>
          if (len % 2 != 0) return None
          data = new Array[Short](len / 2)
          var i = 0
          while (i < data.length) { data(i) = bb.getShort; i += 1 }
        case _ => bb.position(bb.position() + len) // skip unknown chunk
      }
      // RIFF pads odd-length chunks to even alignment with one byte;
      // a walk that ignores the pad misreads every later chunk id.
      if (len % 2 == 1 && bb.remaining >= 1) bb.get
    }
    if (rate <= 0 || data == null) None
    else Some(DecodedClip(rate, data))
  }
}
