package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQLite database ingest — the single-file database format
  * annotation sets, app-data drops, and scraped-metadata corpora
  * actually arrive in (every browser profile, every mobile app export,
  * many public-records dumps ship `.sqlite`/`.db`). The runtime
  * carries no SQLite codec, so this is a from-scratch implementation
  * of the public file format (sqlite.org/fileformat2) in the
  * bzip2/JPEG/LZMA/FLAC tradition: the 100-byte header, table b-tree
  * pages (leaf + interior), big-endian varints, the record serial-type
  * system, payload spill with the spec's exact minLocal/maxLocal
  * arithmetic and overflow-page chains, and the `sqlite_master` schema
  * walk that routes a table NAME to its root page.
  *
  * The INTEGER-PRIMARY-KEY rowid alias is honored: a column declared
  * `INTEGER PRIMARY KEY` (inline or via a single-column table
  * constraint) is stored as NULL in every record and its true value is
  * the cell's rowid — a reader that misses this returns NULL ids for
  * the most common table shape in the wild.
  *
  * Reject-don't-guess:
  *  - WAL-mode files (write/read version 2) reject loudly: the main
  *    file alone may be missing checkpointed-but-unsynced
  *    transactions, and silently dropping recent rows is confident
  *    garbage;
  *  - UTF-16 text encodings, WITHOUT ROWID tables, and the reserved
  *    serial types 10/11 reject;
  *  - every page number bounds-checks, b-tree and overflow walks carry
  *    cycle guards, cell pointers and cell content bounds-check
  *    against the usable page area, records must consume their payload
  *    EXACTLY, and a declared page count must match the file length.
  *
  * The writer is the fixture's reverse direction (single-level and
  * two-level table b-trees, spill-formula overflow chains, the rowid
  * alias, real header arithmetic); `SqliteSpec` proves BOTH directions
  * against the reference implementation when the system `sqlite3`
  * binary is present — our reader byte-exactly reads databases real
  * sqlite3 wrote (including freelist pages and non-contiguous rowids
  * left by deletes), and real sqlite3 reads our writer's output with
  * `PRAGMA integrity_check` = ok.
  *
  * Shape at 100 TB: a database file is the natural split unit —
  * per-file parallelism, scan-local walk, zero shuffle.
  */
object Sqlite {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  sealed trait SqlValue
  case object SqlNull extends SqlValue
  final case class SqlInt(v: Long) extends SqlValue
  final case class SqlReal(v: Double) extends SqlValue
  final case class SqlText(v: String) extends SqlValue
  final case class SqlBlob(v: Array[Byte]) extends SqlValue

  // ---------------- primitives (all big-endian, per spec) ----------------

  private def u16(b: Array[Byte], o: Int): Int = {
    if (o + 2 > b.length) throw Malformed
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    if (o + 4 > b.length) throw Malformed
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  /** SQLite varint: 1–9 bytes, MSB-first 7-bit groups; the 9th byte
    * contributes all 8 bits. Returns (value, bytesConsumed).
    */
  private def varint(b: Array[Byte], o: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      if (o + i >= b.length) throw Malformed
      val x = b(o + i)
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    if (o + 8 >= b.length) throw Malformed
    ((v << 8) | (b(o + 8) & 0xff), 9)
  }

  // ---------------- database container ----------------

  private final case class Db(b: Array[Byte], pageSize: Int, usable: Int,
      nPages: Int) {
    def pageOff(pno: Int): Int = {
      if (pno < 1 || pno > nPages) throw Malformed
      (pno - 1) * pageSize
    }
  }

  private def open(bytes: Array[Byte]): Db = {
    if (bytes == null || bytes.length < 512) throw Malformed
    val magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")
    var i = 0
    while (i < 16) { if (bytes(i) != magic(i)) throw Malformed; i += 1 }
    val psRaw = u16(bytes, 16)
    val pageSize = if (psRaw == 1) 65536 else psRaw
    if (pageSize < 512 || pageSize > 65536 ||
      (pageSize & (pageSize - 1)) != 0) throw Malformed
    // WAL-mode files reject: the main file alone may be stale
    if (bytes(18) != 1 || bytes(19) != 1) throw Malformed
    // payload fractions are fixed by the spec
    if ((bytes(21) & 0xff) != 64 || (bytes(22) & 0xff) != 32 ||
      (bytes(23) & 0xff) != 32) throw Malformed
    val reserved = bytes(20) & 0xff
    val usable = pageSize - reserved
    if (usable < 480) throw Malformed
    if (u32(bytes, 56) != 1) throw Malformed // UTF-8 only
    // header db-size is authoritative when change-counter matches
    // version-valid-for; either way the file must be whole pages and
    // the declared count must match the actual length
    val declared = u32(bytes, 28)
    if (bytes.length % pageSize != 0) throw Malformed
    val actualPages = bytes.length / pageSize
    if (declared != 0 && u32(bytes, 24) == u32(bytes, 92) &&
      declared != actualPages) throw Malformed
    Db(bytes, pageSize, usable, actualPages)
  }

  // ---------------- record (row) decode ----------------

  /** Decode one record payload; must consume `payload` EXACTLY. */
  private def decodeRecord(payload: Array[Byte]): Vector[SqlValue] = {
    val (hdrLen, n0) = varint(payload, 0)
    if (hdrLen < n0 || hdrLen > payload.length) throw Malformed
    val types = Vector.newBuilder[Long]
    var p = n0
    while (p < hdrLen) {
      val (t, n) = varint(payload, p)
      types += t
      p += n
    }
    if (p != hdrLen) throw Malformed
    var body = hdrLen.toInt
    val out = Vector.newBuilder[SqlValue]
    types.result().foreach { t =>
      val (v, size): (SqlValue, Int) = t match {
        case 0 => (SqlNull, 0)
        case 1 => (SqlInt(payload(chk(body, 1, payload)).toLong), 1)
        case 2 => (SqlInt(sint(payload, body, 2)), 2)
        case 3 => (SqlInt(sint(payload, body, 3)), 3)
        case 4 => (SqlInt(sint(payload, body, 4)), 4)
        case 5 => (SqlInt(sint(payload, body, 6)), 6)
        case 6 => (SqlInt(sint(payload, body, 8)), 8)
        case 7 =>
          (SqlReal(java.lang.Double.longBitsToDouble(sint(payload, body, 8))), 8)
        case 8 => (SqlInt(0L), 0)
        case 9 => (SqlInt(1L), 0)
        case 10 | 11 => throw Malformed // reserved for internal use
        case n if n >= 12 && (n & 1) == 0 =>
          // Long-domain length check BEFORE toInt: a declared type near
          // 2^33 would otherwise truncate to a small Int and decode as a
          // short blob with a consistent exact-consume
          if ((n - 12) / 2 > payload.length) throw Malformed
          val len = ((n - 12) / 2).toInt
          chk(body, len, payload)
          (SqlBlob(java.util.Arrays.copyOfRange(payload, body, body + len)), len)
        case n =>
          if ((n - 13) / 2 > payload.length) throw Malformed // same rule
          val len = ((n - 13) / 2).toInt
          chk(body, len, payload)
          (SqlText(new String(payload, body, len,
            java.nio.charset.StandardCharsets.UTF_8)), len)
      }
      out += v
      body += size
    }
    if (body != payload.length) throw Malformed // exact consume
    out.result()
  }
  private def chk(o: Int, len: Int, b: Array[Byte]): Int = {
    if (o < 0 || len < 0 || o + len > b.length) throw Malformed
    o
  }
  /** Big-endian signed integer of `n` bytes. */
  private def sint(b: Array[Byte], o: Int, n: Int): Long = {
    chk(o, n, b)
    var v = b(o).toLong // sign-extends
    var i = 1
    while (i < n) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
    v
  }

  // ---------------- b-tree walk ----------------

  /** All (rowid, record) pairs of the table b-tree rooted at `root`,
    * in rowid order.
    */
  private def walkTable(db: Db, root: Int): Vector[(Long, Vector[SqlValue])] = {
    val out = Vector.newBuilder[(Long, Vector[SqlValue])]
    val visited = new java.util.HashSet[Integer]()
    def page(pno: Int, depth: Int): Unit = {
      if (!visited.add(pno)) throw Malformed // cycle
      // real sqlite b-trees are ≤ ~10 deep; a crafted linear chain of
      // interior pages would otherwise drive a StackOverflowError — an
      // Error, not an Exception, escaping the decoder envelope
      if (depth > 32) throw Malformed
      val off = db.pageOff(pno)
      val hdr = off + (if (pno == 1) 100 else 0)
      val ptype = db.b(hdr) & 0xff
      val nCells = u16(db.b, hdr + 3)
      ptype match {
        case 13 => // table leaf
          val cellPtrs = hdr + 8
          var c = 0
          while (c < nCells) {
            val cellOff = off + u16(db.b, cellPtrs + 2 * c)
            if (cellOff < hdr + 8 || cellOff >= off + db.usable) throw Malformed
            val (payloadLen, n1) = varint(db.b, cellOff)
            val (rowid, n2) = varint(db.b, cellOff + n1)
            out += rowid -> decodeRecord(
              cellPayload(db, cellOff + n1 + n2, payloadLen, visited,
                off + db.usable))
            c += 1
          }
        case 5 => // table interior
          val cellPtrs = hdr + 12
          var c = 0
          while (c < nCells) {
            val cellOff = off + u16(db.b, cellPtrs + 2 * c)
            if (cellOff < hdr + 12 || cellOff + 4 > off + db.usable) throw Malformed
            page(u32(db.b, cellOff).toInt, depth + 1)
            c += 1
          }
          page(u32(db.b, hdr + 8).toInt, depth + 1) // right-most pointer
        case _ => throw Malformed // index pages (WITHOUT ROWID) or garbage
      }
    }
    page(root, 0)
    out.result()
  }

  /** Assemble a cell's full payload, following the overflow chain per
    * the spec's spill arithmetic when it does not fit locally.
    */
  private def cellPayload(db: Db, start: Int, payloadLen: Long,
      visited: java.util.HashSet[Integer], pageEnd: Int): Array[Byte] = {
    if (payloadLen < 0 || payloadLen > (64 << 20)) throw Malformed // bomb cap
    val total = payloadLen.toInt
    val maxLocal = db.usable - 35
    if (total <= maxLocal) {
      chk(start, total, db.b)
      // local portion must stay inside the OWNING page's usable area —
      // a whole-file bound would let a cell near a page end silently
      // read the next page's bytes as row data
      if (start + total > pageEnd) throw Malformed
      return java.util.Arrays.copyOfRange(db.b, start, start + total)
    }
    val minLocal = (db.usable - 12) * 32 / 255 - 23
    val k = minLocal + (total - minLocal) % (db.usable - 4)
    val local = if (k <= maxLocal) k else minLocal
    chk(start, local + 4, db.b)
    if (start + local + 4 > pageEnd) throw Malformed // same page-bound rule
    val out = new Array[Byte](total)
    System.arraycopy(db.b, start, out, 0, local)
    var got = local
    var next = u32(db.b, start + local).toInt
    while (got < total) {
      if (next == 0) throw Malformed // chain ends early
      if (!visited.add(-next)) throw Malformed // overflow cycle (negated key
      // space so overflow pages can't collide with b-tree page visits)
      val po = db.pageOff(next)
      val take = math.min(total - got, db.usable - 4)
      chk(po + 4, take, db.b)
      System.arraycopy(db.b, po + 4, out, got, take)
      got += take
      next = u32(db.b, po).toInt
    }
    out
  }

  // ---------------- schema walk ----------------

  final case class TableInfo(rootPage: Int, sql: String, columns: Vector[String],
      ipkIndex: Int, realAffinity: Set[Int])

  /** Resolve a table by NAME through `sqlite_master` (root = page 1).
    * Parses the stored CREATE TABLE text for column names and the
    * INTEGER-PRIMARY-KEY rowid alias; WITHOUT ROWID tables throw.
    */
  private def tableInfo(db: Db, name: String): TableInfo = {
    val master = walkTable(db, 1)
    val row = master.collectFirst {
      case (_, Vector(SqlText("table"), SqlText(`name`), SqlText(_),
          SqlInt(root), SqlText(sql))) => (root, sql)
    }.getOrElse(throw Malformed)
    val (root, sql) = row
    if (root < 1 || root > db.nPages) throw Malformed
    val upper = sql.toUpperCase(java.util.Locale.ROOT)
    if (upper.replaceAll("\\s+", " ").endsWith("WITHOUT ROWID")) throw Malformed
    // column list: between the first '(' and its matching ')', split on
    // top-level commas; table-constraint entries are recognized by
    // their leading keyword
    val open = sql.indexOf('(')
    if (open < 0) throw Malformed
    var depth = 0
    var p = open
    var close = -1
    while (p < sql.length && close < 0) {
      sql.charAt(p) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = p
        case _ =>
      }
      p += 1
    }
    if (close < 0) throw Malformed
    val defs = Vector.newBuilder[String]
    var last = open + 1
    depth = 0
    p = open + 1
    while (p < close) {
      sql.charAt(p) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          defs += sql.substring(last, p).trim; last = p + 1
        case _ =>
      }
      p += 1
    }
    defs += sql.substring(last, close).trim
    val constraintKw = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    def firstWord(s: String): String =
      s.takeWhile(c => !c.isWhitespace).stripPrefix("\"").stripSuffix("\"")
    val (colDefs, constraints) = defs.result().partition { d =>
      !constraintKw.contains(firstWord(d).toUpperCase(java.util.Locale.ROOT))
    }
    val columns = colDefs.map(firstWord)
    // rowid alias: inline `<col> INTEGER PRIMARY KEY`, or a
    // single-column table constraint `PRIMARY KEY(<col>)` on an
    // INTEGER-typed column
    val inlineIpk = colDefs.indexWhere(d =>
      d.toUpperCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
        .contains(" INTEGER PRIMARY KEY"))
    val ipk =
      if (inlineIpk >= 0) inlineIpk
      else constraints.map(_.toUpperCase(java.util.Locale.ROOT))
        .collectFirst {
          case c if c.startsWith("PRIMARY KEY") =>
            // sqlite_master SQL text is attacker-controlled: a bare
            // "PRIMARY KEY" without parens would make substring(0,-1)
            // throw StringIndexOutOfBoundsException past the envelope
            val lp = c.indexOf('(')
            val rp = c.lastIndexOf(')')
            if (lp < 0 || rp < lp) throw Malformed
            val inner = c.substring(lp + 1, rp)
              .trim.stripPrefix("\"").stripSuffix("\"")
            colDefs.indexWhere { d =>
              firstWord(d).equalsIgnoreCase(inner) &&
                d.toUpperCase(java.util.Locale.ROOT).split("\\s+")
                  .drop(1).headOption.contains("INTEGER")
            }
        }.getOrElse(-1)
    // REAL column affinity: sqlite stores integral reals AS INTEGERS on
    // disk (a documented storage optimization), so read-back must
    // convert them — a reader that skips this returns SqlInt(96) where
    // the database holds 96.0. The declared type is the token run after
    // the column name, up to the first constraint keyword.
    val constraintStart = Set("PRIMARY", "NOT", "UNIQUE", "CHECK", "DEFAULT",
      "REFERENCES", "COLLATE", "GENERATED", "AS")
    val realAff = colDefs.zipWithIndex.collect {
      case (d, i) if {
        val toks = d.split("\\s+").drop(1)
          .takeWhile(t => !constraintStart.contains(t.toUpperCase(java.util.Locale.ROOT)))
        val ty = toks.mkString(" ").toUpperCase(java.util.Locale.ROOT)
        !ty.contains("INT") && (ty.contains("REAL") || ty.contains("FLOA") ||
          ty.contains("DOUB"))
      } => i
    }.toSet
    TableInfo(root.toInt, sql, columns, ipk, realAff)
  }

  /** All rows of `table`, rowid-ordered, with the rowid alias applied
    * and short records (schema evolution) padded with NULL. None on
    * any file-format violation.
    */
  def rows(bytes: Array[Byte], table: String): Option[Vector[Vector[SqlValue]]] = {
    try {
      val db = open(bytes)
      val info = tableInfo(db, table)
      val n = info.columns.length
      Some(walkTable(db, info.rootPage).map { case (rowid, rec) =>
        if (rec.length > n) throw Malformed
        val padded = if (rec.length < n)
          rec ++ Vector.fill(n - rec.length)(SqlNull) else rec
        val aliased = if (info.ipkIndex >= 0) {
          if (padded(info.ipkIndex) != SqlNull) throw Malformed // alias is stored NULL
          padded.updated(info.ipkIndex, SqlInt(rowid))
        } else padded
        // REAL-affinity read-back conversion (see tableInfo)
        if (info.realAffinity.isEmpty) aliased
        else aliased.zipWithIndex.map {
          case (SqlInt(v), i) if info.realAffinity.contains(i) => SqlReal(v.toDouble)
          case (v, _) => v
        }
      })
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Table names present in the file (schema walk only). */
  def tableNames(bytes: Array[Byte]): Option[Vector[String]] =
    try {
      val db = open(bytes)
      Some(walkTable(db, 1).collect {
        case (_, Vector(SqlText("table"), SqlText(n), _, _, _)) => n
      })
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  // ---------------- Spark surface ----------------

  val docSchema: StructType = StructType(Seq(
    StructField("fname", StringType),
    StructField("doc_id", LongType),
    StructField("body", StringType),
    StructField("nchars", LongType),
    StructField("score", DoubleType)))

  /** binaryFile-shaped relation of SQLite files → typed rows of the
    * `docs(doc_id INTEGER PRIMARY KEY, body TEXT, nchars INTEGER,
    * score REAL)` table. A file with ANY format violation — or a row
    * whose types don't match the declared shape — contributes zero
    * rows: a database that half-reads is corrupt, not short.
    */
  def parseDocs(raw: DataFrame, table: String = "docs"): DataFrame = {
    val input = raw.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("fname"), col("content"))
    input.mapPartitions { it =>
      it.flatMap { r =>
        val fname = r.getString(0)
        val decoded = rows(r.getAs[Array[Byte]](1), table).flatMap { rs =>
          val out = Vector.newBuilder[Row]
          var ok = true
          rs.foreach {
            case Vector(SqlInt(id), SqlText(body), SqlInt(nc), SqlReal(s)) =>
              out += Row(fname, id, body, nc, s)
            case _ => ok = false
          }
          if (ok) Some(out.result()) else None
        }
        decoded.map(_.iterator).getOrElse(Iterator.empty)
      }
    }(RowEncoder.encoderFor(docSchema))
  }

  // ---------------- writer (fixture reverse direction) ----------------

  private def varintBytes(v: Long): Array[Byte] = {
    if (v < 0) { // 9-byte form
      val out = new Array[Byte](9)
      out(8) = (v & 0xff).toByte
      var x = v >>> 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i -= 1 }
      return out
    }
    val out = Vector.newBuilder[Byte]
    var started = false
    var i = 8
    while (i >= 1) {
      val part = ((v >>> (7 * i)) & 0x7f).toInt
      if (part != 0 || started) { out += ((part | 0x80).toByte); started = true }
      i -= 1
    }
    out += (v & 0x7f).toByte
    out.result().toArray
  }

  private def encodeRecord(values: Seq[SqlValue]): Array[Byte] = {
    val types = values.map {
      case SqlNull => 0L
      case SqlInt(0) => 8L
      case SqlInt(1) => 9L
      case SqlInt(v) =>
        val bits = 65 - java.lang.Long.numberOfLeadingZeros(if (v < 0) ~v else v)
        if (bits <= 8) 1L else if (bits <= 16) 2L else if (bits <= 24) 3L
        else if (bits <= 32) 4L else if (bits <= 48) 5L else 6L
      case SqlReal(_) => 7L
      case SqlBlob(b) => 12L + 2L * b.length
      case SqlText(t) => 13L + 2L * t.getBytes("UTF-8").length
    }
    val typeBytes = types.flatMap(varintBytes).toArray
    // header length varint includes itself
    var hdrLen = typeBytes.length + 1
    if (varintBytes(hdrLen.toLong).length > 1) hdrLen = typeBytes.length +
      varintBytes((typeBytes.length + 2).toLong).length
    val out = new java.io.ByteArrayOutputStream()
    out.write(varintBytes(hdrLen.toLong))
    out.write(typeBytes)
    values.zip(types).foreach {
      case (SqlInt(v), t) if t >= 1 && t <= 6 =>
        val n = Seq(1, 2, 3, 4, 6, 8)(t.toInt - 1)
        var i = n - 1
        while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
      case (SqlReal(d), _) =>
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 7
        while (i >= 0) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i -= 1 }
      case (SqlBlob(b), _) => out.write(b)
      case (SqlText(t), _) => out.write(t.getBytes("UTF-8"))
      case _ => // NULL / 0 / 1: no body bytes
    }
    out.toByteArray
  }

  private final class PageBuilder(pageSize: Int) {
    val pages = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def alloc(): Int = { pages += new Array[Byte](pageSize); pages.length }
    def put16(pno: Int, off: Int, v: Int): Unit = {
      val p = pages(pno - 1)
      p(off) = ((v >>> 8) & 0xff).toByte; p(off + 1) = (v & 0xff).toByte
    }
    def put32(pno: Int, off: Int, v: Long): Unit = {
      val p = pages(pno - 1)
      var i = 0
      while (i < 4) { p(off + i) = ((v >>> (8 * (3 - i))) & 0xff).toByte; i += 1 }
    }
  }

  /** Build one table b-tree from rowid-ordered (rowid, record) pairs;
    * returns the root page number. Two levels max (root interior over
    * leaf pages) — ample for fixture scale, and the READER's depth is
    * unbounded either way.
    */
  private def buildTable(pb: PageBuilder, pageSize: Int,
      rows: Seq[(Long, Array[Byte])], headerRoom: Int = 0): Int = {
    val usable = pageSize
    val maxLocal = usable - 35
    val minLocal = (usable - 12) * 32 / 255 - 23
    // cell bytes (+ overflow pages) per row
    val cells = rows.map { case (rowid, rec) =>
      val total = rec.length
      if (total <= maxLocal) {
        varintBytes(total.toLong) ++ varintBytes(rowid) ++ rec
      } else {
        val k = minLocal + (total - minLocal) % (usable - 4)
        val local = if (k <= maxLocal) k else minLocal
        // overflow chain, built back to front so next-pointers are known
        var rem = total - local
        val chunks = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        var off = total
        while (rem > 0) {
          val take = math.min(rem, usable - 4)
          // chunks are taken back-to-front: this chunk is rec[off-take, off)
          chunks += java.util.Arrays.copyOfRange(rec, off - take, off)
          off -= take
          rem -= take
        }
        var next = 0L
        chunks.foreach { chunk =>
          val pno = pb.alloc()
          pb.put32(pno, 0, next)
          System.arraycopy(chunk, 0, pb.pages(pno - 1), 4, chunk.length)
          next = pno.toLong
        }
        varintBytes(total.toLong) ++ varintBytes(rowid) ++
          java.util.Arrays.copyOfRange(rec, 0, local) ++
          Array[Byte](((next >>> 24) & 0xff).toByte, ((next >>> 16) & 0xff).toByte,
            ((next >>> 8) & 0xff).toByte, (next & 0xff).toByte)
      }
    }
    // greedy pack into leaves (first leaf may carry the 100-byte header)
    final case class Leaf(cells: Seq[(Long, Array[Byte])]) // (rowid, cellBytes)
    val leaves = scala.collection.mutable.ArrayBuffer[Seq[(Long, Array[Byte])]]()
    var cur = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    var used = 0
    rows.map(_._1).zip(cells).foreach { case (rowid, cell) =>
      val room = usable - 8 - (if (leaves.isEmpty) headerRoom else 0)
      if (cur.nonEmpty && used + cell.length + 2 > room) {
        leaves += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer(); used = 0
      }
      cur += rowid -> cell
      used += cell.length + 2
    }
    if (cur.nonEmpty) leaves += cur.toSeq
    require(leaves.nonEmpty, "empty table")
    def writeLeaf(cellSeq: Seq[(Long, Array[Byte])], hdrOff: Int): Int = {
      val pno = pb.alloc()
      val page = pb.pages(pno - 1)
      page(hdrOff) = 13
      pb.put16(pno, hdrOff + 1, 0) // no freeblocks
      pb.put16(pno, hdrOff + 3, cellSeq.length)
      var content = usable
      var i = 0
      cellSeq.foreach { case (_, cell) =>
        content -= cell.length
        System.arraycopy(cell, 0, page, content, cell.length)
        pb.put16(pno, hdrOff + 8 + 2 * i, content)
        i += 1
      }
      pb.put16(pno, hdrOff + 5, if (content == 65536) 0 else content)
      page(hdrOff + 7) = 0
      pno
    }
    if (leaves.length == 1) return writeLeaf(leaves.head, headerRoom)
    val leafPages = leaves.map(l => (l.last._1, writeLeaf(l, 0)))
    // root interior: (leftChild, maxRowidOfChild) cells + right-most ptr
    val pno = pb.alloc()
    val page = pb.pages(pno - 1)
    val hdrOff = headerRoom
    page(hdrOff) = 5
    pb.put16(pno, hdrOff + 1, 0)
    pb.put16(pno, hdrOff + 3, leafPages.length - 1)
    pb.put32(pno, hdrOff + 8, leafPages.last._2.toLong)
    var content = usable
    var i = 0
    leafPages.dropRight(1).foreach { case (maxRowid, child) =>
      val cell = Array[Byte](
        ((child >>> 24) & 0xff).toByte, ((child >>> 16) & 0xff).toByte,
        ((child >>> 8) & 0xff).toByte, (child & 0xff).toByte) ++
        varintBytes(maxRowid)
      content -= cell.length
      require(content >= hdrOff + 12 + 2 * leafPages.length, "root overflow")
      System.arraycopy(cell, 0, page, content, cell.length)
      pb.put16(pno, hdrOff + 12 + 2 * i, content)
      i += 1
    }
    pb.put16(pno, hdrOff + 5, if (content == 65536) 0 else content)
    page(hdrOff + 7) = 0
    pno
  }

  /** Write a single-table database. `rows` are (rowid, values) with
    * the ipk column (if any) passed as its true value — the writer
    * stores NULL there and the rowid carries it, exactly as real
    * sqlite does.
    */
  def makeDb(table: String, createSql: String, ipkIndex: Int,
      rowsIn: Seq[(Long, Seq[SqlValue])], pageSize: Int = 4096): Array[Byte] = {
    require(rowsIn.nonEmpty)
    val sorted = rowsIn.sortBy(_._1)
    val recs = sorted.map { case (rowid, values) =>
      val stored = if (ipkIndex >= 0) {
        require(values(ipkIndex) == SqlInt(rowid), "ipk value must equal rowid")
        values.updated(ipkIndex, SqlNull)
      } else values
      rowid -> encodeRecord(stored)
    }
    val pb = new PageBuilder(pageSize)
    // page 1 reserved for sqlite_master
    val p1 = pb.alloc()
    require(p1 == 1)
    val dataRoot = buildTable(pb, pageSize, recs)
    val masterRec = encodeRecord(Seq(SqlText("table"), SqlText(table),
      SqlText(table), SqlInt(dataRoot.toLong), SqlText(createSql)))
    // master table must fit page 1 (fixture scale); rebuild in place
    val tmp = new PageBuilder(pageSize)
    tmp.alloc()
    val mroot = buildTable(tmp, pageSize, Seq(1L -> masterRec), headerRoom = 100)
    require(mroot == 2 && tmp.pages.length == 2, "master spill unsupported")
    System.arraycopy(tmp.pages(1), 0, pb.pages(0), 0, pageSize)
    // 100-byte file header over page 1
    val h = pb.pages(0)
    val magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")
    System.arraycopy(magic, 0, h, 0, 16)
    h(16) = ((pageSize >>> 8) & 0xff).toByte; h(17) = (pageSize & 0xff).toByte
    h(18) = 1; h(19) = 1 // journal mode
    h(20) = 0            // no reserved space
    h(21) = 64; h(22) = 32; h(23) = 32
    pb.put32(1, 24, 1L)  // change counter
    pb.put32(1, 28, pb.pages.length.toLong)
    pb.put32(1, 32, 0L); pb.put32(1, 36, 0L) // no freelist
    pb.put32(1, 40, 1L)  // schema cookie
    pb.put32(1, 44, 4L)  // schema format 4
    pb.put32(1, 48, 0L)
    pb.put32(1, 52, 0L)  // not auto-vacuum
    pb.put32(1, 56, 1L)  // UTF-8
    pb.put32(1, 60, 0L); pb.put32(1, 64, 0L); pb.put32(1, 68, 0L)
    pb.put32(1, 92, 1L)  // version-valid-for = change counter
    pb.put32(1, 96, 3040001L)
    val out = new java.io.ByteArrayOutputStream()
    pb.pages.foreach(out.write)
    out.toByteArray
  }
}
