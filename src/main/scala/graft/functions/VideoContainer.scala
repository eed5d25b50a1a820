package graft.functions

/** Minimal deterministic frame container ("GVID"): magic + frame count
  * + int32 frame lengths + concatenated PNG blobs. No real video
  * codec ships in this container (and decoding H.264 is format work,
  * not engine work); what the engine must prove at 100 TB is the
  * PLUMBING — an opaque binary column parsed on executors, a bounded
  * frame-sample (never all frames), and a real per-frame image decode
  * — which this container exercises genuinely: lengths are walked,
  * blobs sliced, and each sampled frame goes through ImageIO.
  */
object VideoContainer {

  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + 4 * frames.length + frames.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GVID".getBytes("US-ASCII")).putInt(frames.length)
    frames.foreach(f => bb.putInt(f.length))
    frames.foreach(bb.put)
    bb.array()
  }

  /** Frame count without materializing any frame (header-only). */
  def frameCount(bytes: Array[Byte]): Option[Int] = {
    if (bytes.length < 8) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    if (new String(magic, "US-ASCII") != "GVID") return None
    val n = bb.getInt
    if (n < 0 || bytes.length < 8L + 4L * n) None else Some(n)
  }

  /** Slice out ONLY the requested frame indices (ascending) — the
    * frame-sample path never copies unsampled frames.
    */
  def sampleFrames(bytes: Array[Byte], idxs: Seq[Int]): Option[Seq[Array[Byte]]] =
    frameCount(bytes).flatMap { n =>
      if (idxs.exists(i => i < 0 || i >= n)) None
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.position(8)
        val lens = Array.fill(n)(bb.getInt)
        if (lens.exists(_ < 0)) None
        else {
          val offsets = lens.scanLeft(8 + 4 * n)(_ + _)
          if (offsets.last > bytes.length) None
          else Some(idxs.map { i =>
            java.util.Arrays.copyOfRange(bytes, offsets(i), offsets(i) + lens(i))
          })
        }
      }
    }
}
