package graft

/** Dev drill for the VP8 decoder: decode a .webp file and dump planes
  * as JSON hex (same shape as scripts/vp8_reference.py decode), so a
  * plane-level diff pinpoints the first diverging pixel.
  */
object Vp8Dev {
  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))
    val payload = graft.operators.Vp8.vp8Chunk(bytes).getOrElse {
      // raw VP8 payload file
      bytes
    }
    val out = graft.operators.Vp8.decodeYuv(payload) match {
      case None => """{"error":"reject"}"""
      case Some(yuv) =>
        def hx(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
        val rgba = graft.operators.Vp8.yuvToRgba(yuv)
        s"""{"w": ${yuv.width}, "h": ${yuv.height}, "y": "${hx(yuv.y)}", "u": "${hx(yuv.u)}", "v": "${hx(yuv.v)}", "rgba": "${hx(rgba)}"}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
      out.getBytes("UTF-8"))
    ()
  }
}
