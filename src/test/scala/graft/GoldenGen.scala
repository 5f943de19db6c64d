package graft
/** One-shot generator (dev-time, requires xz + bsdtar): reference-encoded
  * streams for every branch/delta filter chain + one bsdtar-authored 7z,
  * committed as golden resources so the interop evidence survives
  * sandboxes without the binaries (the brotli 72-stream precedent).
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val b64 = java.util.Base64.getEncoder
    def runXz(xargs: Seq[String], stdin: Array[Byte]): Array[Byte] = {
      val tmp = java.io.File.createTempFile("golden", ".bin")
      java.nio.file.Files.write(tmp.toPath, stdin)
      val p = new ProcessBuilder(("xz" +: xargs): _*).redirectInput(tmp).start()
      val out = p.getInputStream.readAllBytes()
      require(p.waitFor() == 0)
      tmp.delete()
      out
    }
    // deterministic payloads per filter family (java.util.Random, fixed seeds)
    def gen(seed: Int, len: Int, kind: String): Array[Byte] = {
      val r = new java.util.Random(seed)
      val b = new Array[Byte](len)
      r.nextBytes(b)
      var i = 0
      kind match {
        case "x86" =>
          while (i < len - 6) {
            b(i) = (if (r.nextBoolean()) 0xe8 else 0xe9).toByte
            if (r.nextBoolean()) b(i + 4) = (if (r.nextBoolean()) 0 else 0xff).toByte
            i += r.nextInt(7) + 2
          }
        case "arm" =>
          while (i + 4 <= len) { if (r.nextInt(3) == 0) b(i + 3) = 0xeb.toByte; i += 4 }
        case "armt" =>
          while (i + 4 <= len) {
            if (r.nextInt(3) == 0) { b(i + 1) = (0xf0 | r.nextInt(8)).toByte; b(i + 3) = (0xf8 | r.nextInt(8)).toByte }
            i += 2
          }
        case "arm64" =>
          while (i + 4 <= len) {
            val w = if (r.nextBoolean()) (0x25 << 26) | (r.nextInt() & 0x03ffffff)
              else if (r.nextInt(3) == 0) {
                val imm = r.nextInt(0x20000)
                0x90000000 | ((imm & 3) << 29) | (((imm >>> 2) & 0x7ffff) << 5) | r.nextInt(32)
              } else r.nextInt()
            b(i) = (w & 0xff).toByte; b(i+1) = ((w >>> 8) & 0xff).toByte
            b(i+2) = ((w >>> 16) & 0xff).toByte; b(i+3) = ((w >>> 24) & 0xff).toByte
            i += 4
          }
        case "ppc" =>
          while (i + 4 <= len) {
            if (r.nextInt(3) == 0) { b(i) = (0x48 | r.nextInt(4)).toByte; b(i + 3) = ((b(i + 3) & 0xfc) | 1).toByte }
            i += 4
          }
        case "sparc" =>
          while (i + 4 <= len) {
            if (r.nextInt(3) == 0) {
              if (r.nextBoolean()) { b(i) = 0x40; b(i + 1) = (b(i + 1) & 0x3f).toByte }
              else { b(i) = 0x7f; b(i + 1) = (b(i + 1) | 0xc0).toByte }
            }
            i += 4
          }
        case "riscv" =>
          def put32(o: Int, w: Int): Unit = {
            b(o) = (w & 0xff).toByte; b(o+1) = ((w >>> 8) & 0xff).toByte
            b(o+2) = ((w >>> 16) & 0xff).toByte; b(o+3) = ((w >>> 24) & 0xff).toByte
          }
          while (i + 8 <= len) {
            r.nextInt(8) match {
              case 0 | 1 =>
                val rd = Seq(1, 5, 1, 5, 2, 7, 0)(r.nextInt(7))
                put32(i, 0x6f | (rd << 7) | (r.nextInt() & 0xfffff000)); i += 4
              case 2 | 3 | 4 =>
                val rd = r.nextInt(32)
                put32(i, 0x17 | (rd << 7) | (r.nextInt() & 0xfffff000))
                val rs1 = if (r.nextBoolean()) rd else r.nextInt(32)
                val low2 = if (r.nextInt(4) == 0) r.nextInt(3) else 3
                put32(i + 4, (r.nextInt() & ~(0x1f << 15) & ~3) | (rs1 << 15) | low2)
                i += 8
              case 5 =>
                val rs1 = r.nextInt(32)
                val low2 = if (r.nextInt(3) == 0) 0 else 3
                val desc = (r.nextInt() & 0xffffc & ~(0x1f << 15)) | (rs1 << 15) | low2
                put32(i, 0x117 | (desc << 12)); i += 4
              case 6 => i += 2
              case _ => i += 4
            }
          }
        case "ia64" =>
          while (i + 16 <= len) {
            if (r.nextInt(3) != 0) {
              val template = Seq(16, 18, 22, 24, 28, 0)(r.nextInt(6))
              var v = BigInt(template)
              for (s2 <- 0 until 3) {
                val top4 = if (r.nextInt(2) == 0) 5L else r.nextInt(16).toLong
                val slot = (top4 << 37) | ((r.nextInt() & 1L) << 36) |
                  ((r.nextInt() & 0xfffffL) << 13) | r.nextInt(512).toLong
                v |= BigInt(slot & ((1L << 41) - 1)) << (5 + 41 * s2)
              }
              val bytes = v.toByteArray.reverse.padTo(16, 0.toByte)
              System.arraycopy(bytes, 0, b, i, 16)
            }
            i += 16
          }
        case _ => // plain
      }
      b
    }
    val cases = Seq(
      ("x86", Seq("--x86"), "x86"), ("arm", Seq("--arm"), "arm"),
      ("armthumb", Seq("--armthumb"), "armt"), ("arm64", Seq("--arm64"), "arm64"),
      ("powerpc", Seq("--powerpc"), "ppc"), ("sparc", Seq("--sparc"), "sparc"),
      ("riscv", Seq("--riscv"), "riscv"),
      ("ia64", Seq("--ia64"), "ia64"),
      ("delta1", Seq("--delta=dist=1"), "plain"),
      ("delta4", Seq("--delta=dist=4"), "plain"),
      ("delta256", Seq("--delta=dist=256"), "plain"),
      ("delta2+x86", Seq("--delta=dist=2", "--x86"), "x86"),
      ("delta4+arm64", Seq("--delta=dist=4", "--arm64"), "arm64"))
    val sb = new StringBuilder("{\n")
    val entries = cases.zipWithIndex.flatMap { case ((name, flags, kind), ci) =>
      (0 until 3).map { k =>
        val payload = gen(1000 + ci * 37 + k, 900 + k * 611 + ci * 131, kind)
        val presets = Seq("preset=0", "preset=6", "preset=9e")
        val enc = runXz(Seq("-z", "-c") ++ flags ++ Seq(s"--lzma2=${presets(k)}") ++
          (if (k == 1) Seq("--check=crc32") else Nil), payload)
        s""""$name-$k": {"payload": "${b64.encodeToString(payload)}", "stream": "${b64.encodeToString(enc)}"}"""
      }
    }
    sb.append(entries.mkString(",\n"))
    sb.append("\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("src/test/resources/golden/xz_branch_streams.json"),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote ${entries.length} xz streams")
    // one bsdtar-authored 7z archive
    val dir = java.nio.file.Files.createTempDirectory("g7z").toFile
    val files = Seq(
      ("alpha.txt", gen(7001, 900, "plain")),
      ("beta.bin", gen(7002, 2200, "x86")),
      ("gamma.dat", Array.fill(3000)('q'.toByte)))
    files.foreach { case (n, b) => java.nio.file.Files.write(new java.io.File(dir, n).toPath, b) }
    val out = new java.io.File(dir, "ref.7z")
    val p = new ProcessBuilder(("bsdtar" +: "-cf" +: out.getAbsolutePath +:
      "--format" +: "7zip" +: "-C" +: dir.getAbsolutePath +: files.map(_._1)): _*).start()
    p.getInputStream.readAllBytes(); require(p.waitFor() == 0)
    val arch = java.nio.file.Files.readAllBytes(out.toPath)
    val sb2 = new StringBuilder("{\n")
    sb2.append(s""""archive": "${b64.encodeToString(arch)}",\n""")
    sb2.append(files.map { case (n, b) =>
      s""""member:$n": "${b64.encodeToString(b)}"""" }.mkString(",\n"))
    sb2.append("\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("src/test/resources/golden/sevenzip_reference.json"),
      sb2.toString.getBytes("UTF-8"))
    println("wrote 7z reference archive (" + arch.length + " bytes)")
    dir.listFiles().foreach(_.delete()); dir.delete()

    // BCJ2 archives: our writer's output, extraction VERIFIED against the
    // reference decoder (bsdtar) at generation time, then committed —
    // pins the four-stream folder bytes against regressions without the
    // binary (the brotli crafted-golden pattern)
    def bsdtarExtract(archive: Array[Byte], member: String): Array[Byte] = {
      val f = java.io.File.createTempFile("golden2", ".7z")
      java.nio.file.Files.write(f.toPath, archive)
      val p2 = new ProcessBuilder("bsdtar", "-xOf", f.getAbsolutePath, member).start()
      val out2 = p2.getInputStream.readAllBytes()
      require(p2.waitFor() == 0, "bsdtar failed")
      f.delete(); out2
    }
    val sb3 = new StringBuilder("{\n")
    val bcj2Entries = Seq(
      ("bcj2-lzma2", 8101, 2600), ("bcj2-lzma2", 8102, 1100),
      ("bcj2-lzma2-none", 8103, 1700), ("bcj2-lzma2-mixed", 8104, 2100),
      ("bcj2-lzma2-mixed", 8105, 900), ("bcj2-lzma2", 8106, 4000)
    ).zipWithIndex.map { case ((kind, seed, len), k) =>
      val payload = gen(seed, len, "x86")
      val arch2 = graft.operators.SevenZip.makeArchive(
        Seq((kind, Seq((s"g$k.bin", payload)))), encodedHeader = k % 2 == 1)
      require(java.util.Arrays.equals(bsdtarExtract(arch2, s"g$k.bin"), payload),
        s"reference validation failed for $kind/$seed")
      s""""$kind-$k": {"payload": "${b64.encodeToString(payload)}", "archive": "${b64.encodeToString(arch2)}"}"""
    }
    sb3.append(bcj2Entries.mkString(",\n"))
    sb3.append("\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("src/test/resources/golden/bcj2_archives.json"),
      sb3.toString.getBytes("UTF-8"))
    println("wrote " + bcj2Entries.length + " reference-validated BCJ2 archives")
  }
}
