package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sqlite
import graft.operators.Sqlite._

class SqliteSpec extends AnyFunSuite {

  private val createSql =
    "CREATE TABLE docs(doc_id INTEGER PRIMARY KEY, body TEXT, nchars INTEGER, score REAL)"

  private def mkRows(n: Int, longEvery: Int = 0): Seq[(Long, Seq[SqlValue])] =
    (1 to n).map { i =>
      val body =
        if (longEvery > 0 && i % longEvery == 0) ("chunk%04d ".format(i) * 600).trim
        else s"body-$i"
      (i.toLong, Seq(SqlInt(i.toLong), SqlText(body),
        SqlInt(body.length.toLong), SqlReal(i * 0.25)))
    }

  test("single-leaf database round-trips; ipk column comes back from the rowid") {
    val db = Sqlite.makeDb("docs", createSql, 0, mkRows(5))
    val got = Sqlite.rows(db, "docs").get
    assert(got.length === 5)
    assert(got(2) === Vector(SqlInt(3), SqlText("body-3"),
      SqlInt(6), SqlReal(0.75)))
    assert(Sqlite.tableNames(db) === Some(Vector("docs")))
  }

  test("overflow chains reassemble: payloads far past maxLocal, exact text back") {
    val rows = mkRows(6, longEvery = 2) // 3 long bodies ~ 5.4 KB each
    val db = Sqlite.makeDb("docs", createSql, 0, rows)
    val got = Sqlite.rows(db, "docs").get
    rows.zip(got).foreach { case ((_, exp), actual) => assert(actual === exp.toVector) }
  }

  test("two-level b-tree (interior root over multiple leaves) walks in rowid order") {
    val rows = mkRows(400) // ~400 cells >> one 4 KiB page
    val db = Sqlite.makeDb("docs", createSql, 0, rows)
    assert(db.length > 4096 * 3)
    val got = Sqlite.rows(db, "docs").get
    assert(got.length === 400)
    assert(got.map { case Vector(SqlInt(id), _, _, _) => id } === (1L to 400L).toVector)
  }

  test("non-contiguous rowids and a table-constraint PRIMARY KEY(col) alias") {
    val rows = Seq(7L, 100L, 4096L, 1000000L).map(id =>
      (id, Seq[SqlValue](SqlInt(id), SqlText(s"t$id"), SqlInt(2L), SqlReal(0.5))))
    val sql = "CREATE TABLE docs(doc_id INTEGER, body TEXT, nchars INTEGER, " +
      "score REAL, PRIMARY KEY(doc_id))"
    val db = Sqlite.makeDb("docs", sql, 0, rows)
    val got = Sqlite.rows(db, "docs").get
    assert(got.map { case Vector(SqlInt(id), _, _, _) => id } ===
      Vector(7L, 100L, 4096L, 1000000L))
  }

  test("no-alias tables keep stored values; short records pad with NULL (schema evolution)") {
    // TEXT primary key is NOT a rowid alias — values stay stored
    val sql = "CREATE TABLE kv(k TEXT PRIMARY KEY, v INTEGER, extra REAL)"
    val rows = Seq(
      (1L, Seq[SqlValue](SqlText("a"), SqlInt(10), SqlReal(1.5))),
      (2L, Seq[SqlValue](SqlText("b"), SqlInt(20), SqlReal(2.5))))
    val db = Sqlite.makeDb("kv", sql, -1, rows)
    assert(Sqlite.rows(db, "kv").get.head ===
      Vector(SqlText("a"), SqlInt(10), SqlReal(1.5)))
  }

  test("format rejects: bad magic, WAL mode, UTF-16, truncation, lying page count, unknown table") {
    val db = Sqlite.makeDb("docs", createSql, 0, mkRows(3))
    def mut(f: Array[Byte] => Unit): Array[Byte] = { val c = db.clone(); f(c); c }
    assert(Sqlite.rows(mut(_(0) = 'X'), "docs") === None)
    assert(Sqlite.rows(mut { c => c(18) = 2; c(19) = 2 }, "docs") === None) // WAL
    assert(Sqlite.rows(mut(_(59) = 2), "docs") === None)  // UTF-16le encoding
    assert(Sqlite.rows(db.dropRight(100), "docs") === None)
    assert(Sqlite.rows(mut(_(31) = 99), "docs") === None) // header page count lies
    assert(Sqlite.rows(db, "nope") === None)
    assert(Sqlite.rows(null, "docs") === None)
  }

  test("structural rejects: cell pointer out of page, record over-consume, overflow cycle") {
    val db = Sqlite.makeDb("docs", createSql, 0, mkRows(3))
    // page 2 is the docs leaf; its first cell pointer lives at offset 8
    val pageOff = 4096
    val evil = db.clone()
    evil(pageOff + 8) = 0x7f.toByte; evil(pageOff + 9) = 0xff.toByte
    assert(Sqlite.rows(evil, "docs") === None)
    // overflow self-cycle: a MID-CHAIN next pointer (nonzero — the
    // terminator of a completed chain is legitimately never read)
    // redirected to its own page must trip the cycle guard, not spin
    val longRows = (1 to 2).map { i =>
      val body = ("loop%04d ".format(i) * 1400).trim // ~12.6 KB → 3 overflow pages
      (i.toLong, Seq[SqlValue](SqlInt(i.toLong), SqlText(body),
        SqlInt(body.length.toLong), SqlReal(i * 0.25)))
    }
    val longDb = Sqlite.makeDb("docs", createSql, 0, longRows)
    assert(Sqlite.rows(longDb, "docs").isDefined) // premise: intact file reads
    val pages = longDb.length / 4096
    var fixed = false
    val cyc = longDb.clone()
    for (p <- 1 until pages if !fixed) {
      val off = p * 4096
      val next = ((cyc(off) & 0xffL) << 24) | ((cyc(off + 1) & 0xffL) << 16) |
        ((cyc(off + 2) & 0xffL) << 8) | (cyc(off + 3) & 0xffL)
      val t = cyc(off) & 0xff
      // an overflow page mid-chain: starts with a plausible page pointer,
      // not a b-tree type byte
      if (t != 13 && t != 5 && t != 2 && t != 10 && next > 0 && next <= pages) {
        val self = p + 1
        cyc(off) = ((self >>> 24) & 0xff).toByte
        cyc(off + 1) = ((self >>> 16) & 0xff).toByte
        cyc(off + 2) = ((self >>> 8) & 0xff).toByte
        cyc(off + 3) = (self & 0xff).toByte
        fixed = true
      }
    }
    assert(fixed, "no mid-chain overflow pointer found to corrupt")
    assert(Sqlite.rows(cyc, "docs") === None)
  }

  // SQLite big-endian base-128 varint (test-local; the engine's is private)
  private def sv(v: Long): Array[Byte] = {
    val groups = Vector.newBuilder[Byte]
    var x = v
    groups += (x & 0x7f).toByte
    x >>>= 7
    while (x != 0) { groups += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    groups.result().reverse.toArray
  }

  /** Replace page 2 of `db` with a single-leaf page holding one
    * hand-built cell at `cellOff` (file-absolute) with `payload`.
    */
  private def spliceLeaf(db: Array[Byte], cellOff: Int,
      payload: Array[Byte]): Array[Byte] = {
    val out = db.clone()
    val off = 4096
    java.util.Arrays.fill(out, off, off + 4096, 0.toByte)
    val cell = sv(payload.length.toLong) ++ sv(1L) ++ payload
    out(off) = 13 // table leaf
    out(off + 3) = 0; out(off + 4) = 1 // one cell
    val ptr = cellOff - off
    out(off + 5) = ((ptr >>> 8) & 0xff).toByte; out(off + 6) = (ptr & 0xff).toByte
    out(off + 8) = ((ptr >>> 8) & 0xff).toByte; out(off + 9) = (ptr & 0xff).toByte
    System.arraycopy(cell, 0, out, cellOff, cell.length)
    out
  }

  test("table-constraint PRIMARY KEY without parens rejects (None), not StringIndexOutOfBounds") {
    val sql = "CREATE TABLE docs(doc_id INTEGER, body TEXT, nchars INTEGER, " +
      "score REAL, PRIMARY KEY(doc_id))"
    val rows = Seq((1L, Seq[SqlValue](SqlInt(1L), SqlText("t"), SqlInt(1L), SqlReal(0.5))))
    val db = Sqlite.makeDb("docs", sql, 0, rows)
    // same-length byte patch of the embedded schema text: the constraint
    // keeps its PRIMARY KEY prefix but loses both parentheses
    val needle = "PRIMARY KEY(doc_id)".getBytes("UTF-8")
    val swap = "PRIMARY KEY doc_idx".getBytes("UTF-8")
    val s = new String(db, java.nio.charset.StandardCharsets.ISO_8859_1)
    val at = s.indexOf(new String(needle, java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(at > 0, "schema text not found to patch")
    val evil = db.clone()
    System.arraycopy(swap, 0, evil, at, swap.length)
    assert(Sqlite.rows(evil, "docs") === None)
  }

  test("serial type near 2^33 rejects in Long domain, never truncates to a short blob") {
    val db = Sqlite.makeDb("docs", createSql, 0, mkRows(3))
    // record: col0 NULL (ipk slot), col1 blob with serial type
    // 12 + 2*(2^32+3) — Int truncation would read it as a 3-byte blob
    // with a consistent exact-consume
    val n = 12L + 2L * ((1L << 32) + 3L)
    val hdr = sv(7L) ++ sv(0L) ++ sv(n)
    assert(hdr.length === 7)
    val payload = hdr ++ Array[Byte](1, 2, 3)
    val evil = spliceLeaf(db, 4096 + 4096 - 30, payload)
    assert(Sqlite.rows(evil, "docs") === None)
  }

  test("local payload crossing its page boundary rejects, never reads the next page's bytes") {
    // three pages: master, docs leaf (replaced), overflow page (the
    // bytes a page-overrunning cell would silently read as row data)
    val db = Sqlite.makeDb("docs", createSql, 0, mkRows(5, longEvery = 5))
    assert(db.length >= 3 * 4096, "fixture needs a page after the leaf")
    // payload 204 bytes placed 50 bytes before the page end: local by
    // size (204 < maxLocal), but start+total lands in page 3
    val hdr = sv(4L) ++ sv(0L) ++ sv(13L + 2L * 200L)
    assert(hdr.length === 4)
    val payload = hdr ++ Array.fill[Byte](200)('x')
    // spliceLeaf writes the cell at 50 bytes before the page edge; the
    // arraycopy runs past it into page 3 — legal as raw file bytes,
    // illegal as page content, exactly what a crafted file arranges
    val evil = spliceLeaf(db, 4096 + 4096 - 50, payload)
    assert(Sqlite.rows(evil, "docs") === None)
  }

  test("a crafted linear interior-page chain rejects at the depth cap, not StackOverflowError") {
    // 100 pages, each a table-interior with zero cells whose right-most
    // pointer names the next page; the last points at a valid leaf.
    // Real b-trees are ~10 deep; this shape only exists to blow stacks.
    val base = Sqlite.makeDb("docs", createSql, 0, mkRows(2))
    val ps = 4096
    val nChain = 100
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    val firstChain = base.length / ps + 1 // 1-based page number
    (0 until nChain).foreach { i =>
      val pg = new Array[Byte](ps)
      pg(0) = 5 // interior
      // nCells = 0; right-most pointer at offset 8
      val target = if (i == nChain - 1) 2 else firstChain + i + 1
      pg(8) = ((target >>> 24) & 0xff).toByte
      pg(9) = ((target >>> 16) & 0xff).toByte
      pg(10) = ((target >>> 8) & 0xff).toByte
      pg(11) = (target & 0xff).toByte
      out.write(pg)
    }
    val big = out.toByteArray
    // fix the header page count and point the docs root at the chain head
    val declared = big.length / ps
    big(28) = ((declared >>> 24) & 0xff).toByte
    big(29) = ((declared >>> 16) & 0xff).toByte
    big(30) = ((declared >>> 8) & 0xff).toByte
    big(31) = (declared & 0xff).toByte
    // sqlite_master's record holds rootpage=2 (serial type 1 int) right
    // before the CREATE TABLE text — patch the byte to the chain head
    val sqlIdx = {
      var i = 100; var at = -1
      val pat = "CREATE TABLE docs".getBytes("US-ASCII")
      while (at < 0 && i + pat.length < ps) {
        if ((0 until pat.length).forall(k => big(i + k) == pat(k))) at = i
        i += 1
      }
      at
    }
    assert(sqlIdx > 0)
    assert((big(sqlIdx - 1) & 0xff) === 2) // premise: rootpage byte found
    require(firstChain < 128)
    big(sqlIdx - 1) = firstChain.toByte
    val t0 = System.nanoTime()
    assert(Sqlite.rows(big, "docs") === None)
    assert(System.nanoTime() - t0 < 1e9)
  }

  test("WITHOUT ROWID tables reject loudly") {
    val sql = "CREATE TABLE docs(doc_id INTEGER PRIMARY KEY, body TEXT, " +
      "nchars INTEGER, score REAL) WITHOUT ROWID"
    val db = Sqlite.makeDb("docs", sql, 0, mkRows(2))
    assert(Sqlite.rows(db, "docs") === None)
  }

  // ---- bidirectional interop with the system sqlite3 (the xz/libbz2
  // precedent): these prove the spec implementation against the
  // reference implementation.

  private def haveSqlite3: Boolean =
    try {
      val p = new ProcessBuilder("sqlite3", "--version").start()
      p.getInputStream.readAllBytes(); p.waitFor() == 0
    } catch { case _: Exception => false }

  private def runSqlite3(dbFile: java.io.File, sql: String): String = {
    val p = new ProcessBuilder("sqlite3", dbFile.getAbsolutePath, sql).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"sqlite3 failed: $err")
    out
  }

  test("reference-written database reads exactly, including freelist pages left by deletes") {
    assume(haveSqlite3, "system sqlite3 not present")
    val f = java.io.File.createTempFile("sqspec", ".db")
    try {
      f.delete()
      // journal_mode delete (default); plant rows, then DELETE some so
      // the file carries freelist pages and non-contiguous rowids; one
      // body is long enough to force a real overflow chain
      val longBody = "lorem ipsum dolor " * 400 // ~7 KB
      runSqlite3(f,
        s"""CREATE TABLE docs(doc_id INTEGER PRIMARY KEY, body TEXT, nchars INTEGER, score REAL);
           |INSERT INTO docs VALUES (1,'alpha',5,0.25),(2,'beta',4,0.5),
           |  (3,'$longBody',${longBody.length},0.75),(10,'gap',3,2.5),(11,'x''y',3,2.75);
           |DELETE FROM docs WHERE doc_id IN (2);
           |INSERT INTO docs VALUES (500,'tail',4,125.0);""".stripMargin)
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val got = Sqlite.rows(bytes, "docs").get
      assert(got.map { case Vector(SqlInt(id), _, _, _) => id } ===
        Vector(1L, 3L, 10L, 11L, 500L))
      assert(got(1) === Vector(SqlInt(3), SqlText(longBody),
        SqlInt(longBody.length.toLong), SqlReal(0.75)))
      assert(got(3) === Vector(SqlInt(11), SqlText("x'y"), SqlInt(3), SqlReal(2.75)))
    } finally f.delete()
  }

  test("reference-written multi-page table (1000 rows) walks complete and ordered") {
    assume(haveSqlite3, "system sqlite3 not present")
    val f = java.io.File.createTempFile("sqspec", ".db")
    try {
      f.delete()
      runSqlite3(f,
        """CREATE TABLE docs(doc_id INTEGER PRIMARY KEY, body TEXT, nchars INTEGER, score REAL);
          |WITH RECURSIVE s(i) AS (SELECT 1 UNION ALL SELECT i+1 FROM s WHERE i<1000)
          |INSERT INTO docs SELECT i, 'row-'||i, length('row-'||i), i*0.125 FROM s;""".stripMargin)
      val got = Sqlite.rows(java.nio.file.Files.readAllBytes(f.toPath), "docs").get
      assert(got.length === 1000)
      assert(got.map { case Vector(SqlInt(id), _, _, _) => id } === (1L to 1000L).toVector)
      assert(got(767) === Vector(SqlInt(768), SqlText("row-768"),
        SqlInt(7), SqlReal(96.0)))
    } finally f.delete()
  }

  test("our writer's output passes the reference integrity check and reads back identically") {
    assume(haveSqlite3, "system sqlite3 not present")
    val rows = mkRows(300, longEvery = 50)
    val db = Sqlite.makeDb("docs", createSql, 0, rows)
    val f = java.io.File.createTempFile("sqspec", ".db")
    try {
      java.nio.file.Files.write(f.toPath, db)
      assert(runSqlite3(f, "PRAGMA integrity_check;").trim === "ok")
      val count = runSqlite3(f, "SELECT count(*), sum(doc_id), sum(nchars) FROM docs;").trim
      val expSum = rows.map(_._1).sum
      val expN = rows.map(_._2(2).asInstanceOf[SqlInt].v).sum
      assert(count === s"300|$expSum|$expN")
      val long50 = runSqlite3(f, "SELECT body FROM docs WHERE doc_id=50;").trim
      assert(long50 === rows(49)._2(1).asInstanceOf[SqlText].v)
    } finally f.delete()
  }
}
