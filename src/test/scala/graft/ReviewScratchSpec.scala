package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bcj

class ReviewScratchSpec extends AnyFunSuite {

  private def haveCmd(cmd: String*): Boolean =
    try {
      val p = new ProcessBuilder(cmd: _*).start()
      p.getInputStream.readAllBytes(); p.waitFor() == 0
    } catch { case _: Exception => false }

  /** xz gained --riscv in 5.6; the runtime's xz has drifted across
    * rounds (5.4 <-> 5.8) so the flag must be capability-probed, not
    * assumed (the committed binary-independent goldens in XzSpec stay
    * as the always-on pin).
    */
  private def haveXzRiscv: Boolean =
    try {
      val p = new ProcessBuilder("xz", "--long-help").start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor() == 0 && out.contains("--riscv")
    } catch { case _: Exception => false }

  private def runXz(args: Seq[String], stdin: Array[Byte]): Array[Byte] = {
    val tmp = java.io.File.createTempFile("rev", ".bin")
    java.nio.file.Files.write(tmp.toPath, stdin)
    val p = new ProcessBuilder(("xz" +: args): _*).redirectInput(tmp).start()
    val out = p.getInputStream.readAllBytes()
    require(p.waitFor() == 0)
    tmp.delete()
    out
  }

  private def refFilteredBytes(xzFile: Array[Byte]): Array[Byte] = {
    val bhSize = ((xzFile(12) & 0xff) + 1) * 4
    graft.operators.Xz.lzma2Decode(xzFile, 12 + bhSize, xzFile.length, 1L << 26, 1L << 27)._1
  }

  test("review: adversarial riscv saturation + ia64 template cycle, byte-exact") {
    assume(haveCmd("xz", "--version"), "system xz not present")
    if (haveXzRiscv) {
      for (seed <- Seq(888001, 888002, 888003)) {
        val r = new java.util.Random(seed)
        val p = new Array[Byte](1 << 19)
        r.nextBytes(p)
        var i = 0
        while (i < p.length) {
          r.nextInt(4) match {
            case 0 => p(i) = 0x17
            case 1 => p(i) = 0xef.toByte
            case 2 => p(i) = 0x97.toByte
            case _ =>
          }
          i += 1 + r.nextInt(3)
        }
        val real = runXz(Seq("-z", "-c", "-T1", "--riscv", "--lzma2=preset=0"), p)
        assert(java.util.Arrays.equals(refFilteredBytes(real), Bcj.riscv(p, true)),
          s"riscv adversarial seed=$seed")
        assert(java.util.Arrays.equals(Bcj.riscv(Bcj.riscv(p, true), false), p),
          s"riscv rt seed=$seed")
      }
    } else info("riscv interop skipped: system xz lacks --riscv (pre-5.6)")
    val pi = new Array[Byte](32 * 16 * 64)
    new java.util.Random(999001).nextBytes(pi)
    var k = 0
    while (k < pi.length) { pi(k) = ((k / 16) % 32).toByte; k += 16 }
    val reali = runXz(Seq("-z", "-c", "-T1", "--ia64", "--lzma2=preset=0"), pi)
    assert(java.util.Arrays.equals(refFilteredBytes(reali), Bcj.ia64(pi, true)),
      "ia64 template-cycle divergence")
    // BCJ2 cross-check: extract a bsdtar-authored 7z of an x86-heavy blob
    // (already covered in SevenZipSpec; here just re-pin one fresh seed)
    if (haveCmd("bsdtar", "--version")) {
      val rb = new java.util.Random(123456)
      val blob = new Array[Byte](50000)
      rb.nextBytes(blob)
      var j = 0
      while (j < blob.length - 5) {
        if (rb.nextInt(5) == 0) blob(j) = (if (rb.nextBoolean()) 0xe8 else 0xe9).toByte
        j += 1 + rb.nextInt(6)
      }
      val arch = graft.operators.SevenZip.makeArchive(
        Seq(("bcj2-lzma2", Seq(("blob.bin", blob)))))
      val tmp = java.io.File.createTempFile("rev", ".7z")
      java.nio.file.Files.write(tmp.toPath, arch)
      val pr = new ProcessBuilder("bsdtar", "-xOf", tmp.getAbsolutePath, "blob.bin").start()
      val ext = pr.getInputStream.readAllBytes()
      assert(pr.waitFor() == 0)
      tmp.delete()
      assert(java.util.Arrays.equals(ext, blob), "bsdtar BCJ2 extraction mismatch")
    } else info("BCJ2 re-pin skipped: bsdtar not present")
  }
}
