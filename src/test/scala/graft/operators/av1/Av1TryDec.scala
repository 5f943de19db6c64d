package graft.operators.av1

/** Dev harness: attempt decode of raw AV1 payload files, print outcome. */
object Av1TryDec {
  def main(a: Array[String]): Unit = a.foreach { f =>
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
    try {
      val r = Av1Decoder.decodeOrThrow(b)
      println(s"$f: decoded planes=${r.planes.length} sub=${r.subX},${r.subY}")
    } catch {
      case e: Throwable =>
        println(s"$f: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }
}
