package graft.operators

/** PDF text extraction — the remaining high-volume document format a
  * crawl-scale training pipeline ingests after HTML (public spec:
  * ISO 32000-1 / the classic PDF 1.4 subset). REAL parsing, no stubs:
  *
  *  - classic cross-reference TABLES from `startxref` (multi-subsection,
  *    `/Prev` chains, newest entry wins) AND the modern PDF 1.5+
  *    cross-reference STREAMS: binary `/W`-framed entries with `/Index`
  *    subsections, PNG-predictor `/DecodeParms` (tags 0–4: None / Sub /
  *    Up / Average / Paeth), type-2 entries resolving through
  *    compressed `/ObjStm` OBJECT STREAMS (header pairs + /First), the
  *    layout current producers actually emit — a `/Prev` chain may mix
  *    both section kinds;
  *  - a full object parser: dicts (nested), arrays, names, numbers,
  *    literal strings (nested parens, every escape class, octal,
  *    line-continuation), hex strings (odd-digit pad), refs (`N G R`
  *    with rollback lookahead), booleans/null, comments;
  *  - the document graph: trailer `/Root` → catalog `/Pages` → NESTED
  *    page-tree walk (Kids of Pages of Pages, in order, cycle-guarded)
  *    → per-page `/Contents` (single stream or array — multiple streams
  *    concatenate with a separator per spec);
  *  - streams framed by `/Length` (direct or INDIRECT ref), decoded
  *    through `/FlateDecode` (zlib via java.util.zip.Inflater — the
  *    JDK's public codec, same as the PNG path); any other filter
  *    rejects the document rather than guessing;
  *  - a content-stream tokenizer driving the text machine: `BT`/`ET`
  *    text objects, `Tj`, `TJ` (array form — kerning numbers ignored,
  *    strings concatenated), `'` and `"` (newline + show), `Td`/`TD`
  *    (newline when ty ≠ 0), `T*`; inline-image `BI…EI` blocks are
  *    skipped, not parsed as operators. Layout reconstruction from
  *    `Tm` matrices is deliberately out of scope — extraction follows
  *    the newline OPERATORS, the deterministic subset.
  *
  * String bytes decode as latin-1 (PDFDocEncoding agrees with it on
  * the printable range; UTF-16BE text strings are out of envelope).
  * Everything malformed — bad xref, truncated stream, unknown filter,
  * cyclic page tree — returns None; the extractor never throws
  * (PdfTextSpec fuzzes truncations, mutations and random soup).
  *
  * Scale shape: one self-contained `Array[Byte] => Option[Seq[String]]`
  * per document — scan-local, zero shuffle, embarrassingly parallel
  * over a binaryFile scan at any corpus size.
  */
object PdfText {

  // ---------------- value model ----------------

  sealed trait V
  final case class VNum(v: Double) extends V
  final case class VName(s: String) extends V
  final case class VStr(s: String) extends V
  final case class VArr(xs: Vector[V]) extends V
  final case class VDict(m: Map[String, V]) extends V
  final case class VRef(n: Int, g: Int) extends V
  final case class VBool(b: Boolean) extends V
  case object VNull extends V

  private final class Lexer(val s: String) {
    var i = 0
    var depth = 0 // parseValue nesting (arrays/dicts) — bounded so a
    // '[[[[…' soup fails as PdfError, never StackOverflowError
    def n: Int = s.length
    def eof: Boolean = i >= n
    def ch: Char = s.charAt(i)
    def ws(): Unit = {
      while (!eof && (isWs(ch) || ch == '%')) {
        if (ch == '%') { while (!eof && ch != '\n' && ch != '\r') i += 1 }
        else i += 1
      }
    }
    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0
    def expect(tok: String): Unit = {
      ws()
      if (!s.regionMatches(false, i, tok, 0, tok.length))
        fail(s"expected $tok at $i")
      i += tok.length
    }
    def peek(tok: String): Boolean = {
      ws(); s.regionMatches(false, i, tok, 0, tok.length)
    }
    def fail(msg: String): Nothing = throw new PdfError(msg)
  }
  private[graft] final class PdfError(msg: String) extends RuntimeException(msg)

  private def isDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%' || c == ' ' || c == '\t' ||
      c == '\r' || c == '\n' || c == '\f' || c == 0

  private def parseName(lx: Lexer): VName = {
    lx.expect("/")
    val b = new StringBuilder
    while (!lx.eof && !isDelim(lx.ch)) {
      if (lx.ch == '#' && lx.i + 2 < lx.n) {
        val h = Integer.parseInt(lx.s.substring(lx.i + 1, lx.i + 3), 16)
        b.append(h.toChar); lx.i += 3
      } else { b.append(lx.ch); lx.i += 1 }
    }
    VName(b.toString)
  }

  private def parseNumber(lx: Lexer): Double = {
    val st = lx.i
    if (!lx.eof && (lx.ch == '+' || lx.ch == '-')) lx.i += 1
    while (!lx.eof && (lx.ch.isDigit || lx.ch == '.')) lx.i += 1
    if (lx.i == st) lx.fail(s"number expected at $st")
    lx.s.substring(st, lx.i).toDouble
  }

  private def parseLiteralString(lx: Lexer): String = {
    lx.expect("(")
    val b = new StringBuilder
    var depth = 1
    while (depth > 0) {
      if (lx.eof) lx.fail("EOF in string")
      val c = lx.ch
      lx.i += 1
      c match {
        case '\\' =>
          if (lx.eof) lx.fail("EOF in escape")
          val e = lx.ch; lx.i += 1
          e match {
            case 'n' => b.append('\n')
            case 'r' => b.append('\r')
            case 't' => b.append('\t')
            case 'b' => b.append('\b')
            case 'f' => b.append('\f')
            case '(' => b.append('(')
            case ')' => b.append(')')
            case '\\' => b.append('\\')
            case '\r' => if (!lx.eof && lx.ch == '\n') lx.i += 1 // continuation
            case '\n' => // continuation: nothing emitted
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && !lx.eof && lx.ch >= '0' && lx.ch <= '7') {
                v = v * 8 + (lx.ch - '0'); lx.i += 1; k += 1
              }
              b.append((v & 0xff).toChar)
            case other => b.append(other) // spec: backslash dropped
          }
        case '(' => depth += 1; b.append('(')
        case ')' => depth -= 1; if (depth > 0) b.append(')')
        case other => b.append(other)
      }
    }
    b.toString
  }

  private def parseHexString(lx: Lexer): String = {
    lx.expect("<")
    val b = new StringBuilder
    var hi = -1
    while (!lx.eof && lx.ch != '>') {
      val c = lx.ch; lx.i += 1
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { b.append(((hi << 4) | d).toChar); hi = -1 }
      } else if (!(c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f'))
        lx.fail(s"bad hex char $c")
    }
    if (lx.eof) lx.fail("EOF in hex string")
    lx.i += 1
    if (hi >= 0) b.append((hi << 4).toChar) // odd count: pad 0
    b.toString
  }

  private def parseValue(lx: Lexer): V = {
    lx.ws()
    if (lx.eof) lx.fail("EOF")
    lx.depth += 1
    if (lx.depth > 128) lx.fail("value nesting too deep")
    try parseValue0(lx) finally lx.depth -= 1
  }

  private def parseValue0(lx: Lexer): V = {
    lx.ch match {
      case '/' => parseName(lx)
      case '(' => VStr(parseLiteralString(lx))
      case '[' =>
        lx.i += 1
        val xs = Vector.newBuilder[V]
        while (!lx.peek("]")) xs += parseValue(lx)
        lx.i += 1
        VArr(xs.result())
      case '<' =>
        if (lx.i + 1 < lx.n && lx.s.charAt(lx.i + 1) == '<') {
          lx.i += 2
          val m = Map.newBuilder[String, V]
          while (!lx.peek(">>")) {
            val k = parseName(lx)
            m += (k.s -> parseValue(lx))
          }
          lx.i += 2
          VDict(m.result())
        } else VStr(parseHexString(lx))
      case c if c.isDigit || c == '+' || c == '-' || c == '.' =>
        val v = parseNumber(lx)
        // ref lookahead: INT INT R
        if (v >= 0 && v == math.floor(v)) {
          val save = lx.i
          lx.ws()
          val st2 = lx.i
          var ok = false
          var g = 0
          if (!lx.eof && lx.ch.isDigit) {
            while (!lx.eof && lx.ch.isDigit) lx.i += 1
            g = lx.s.substring(st2, lx.i).toInt
            lx.ws()
            if (!lx.eof && lx.ch == 'R' &&
                (lx.i + 1 >= lx.n || isDelim(lx.s.charAt(lx.i + 1)))) {
              lx.i += 1; ok = true
            }
          }
          if (ok) return VRef(v.toInt, g)
          lx.i = save
        }
        VNum(v)
      case 't' => lx.expect("true"); VBool(true)
      case 'f' => lx.expect("false"); VBool(false)
      case 'n' => lx.expect("null"); VNull
      case c => lx.fail(s"unexpected '$c' at ${lx.i}")
    }
  }

  // ---------------- document structure ----------------

  private final class Doc(raw: Array[Byte]) {
    val s: String = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    // newest-wins xref map (built following /Prev, newer first)
    val offsets = scala.collection.mutable.Map[Int, Int]()
    // objNum -> (object-stream obj, index within) for ObjStm members
    val compressed = scala.collection.mutable.Map[Int, (Int, Int)]()
    var trailer: Map[String, V] = Map.empty
    // (file key, aes?) once /Encrypt is validated with the empty user
    // password; streams decrypt per object number (generation 0 — the
    // universal case for the files this envelope accepts; an encrypted
    // doc keying streams off nonzero generations would decrypt to
    // garbage and reject downstream, never mis-extract)
    private var cryptKey: Option[(Array[Byte], Boolean)] = None
    private val objCache = scala.collection.mutable.Map[Int, (V, Int)]()
    private val objStmCache = scala.collection.mutable.Map[Int, (String, Vector[(Int, Int)], Int)]()

    def build(): Unit = {
      val sx = s.lastIndexOf("startxref")
      if (sx < 0) throw new PdfError("no startxref")
      val lx = new Lexer(s)
      lx.i = sx + "startxref".length
      lx.ws()
      var off = parseNumber(lx).toInt
      var guard = 0
      while (off >= 0 && guard < 64) {
        guard += 1
        val l2 = new Lexer(s)
        l2.i = off
        l2.ws()
        val t = if (l2.peek("xref")) buildClassic(l2) else buildXrefStream(l2)
        if (trailer.isEmpty) trailer = t
        off = t.get("Prev") match {
          case Some(VNum(p)) => p.toInt
          case _ => -1
        }
      }
    }

    /** Classic `xref` table section; returns its trailer dict. */
    private def buildClassic(l2: Lexer): Map[String, V] = {
      l2.expect("xref")
      var more = true
      while (more) {
        l2.ws()
        if (l2.peek("trailer")) more = false
        else {
          val start = parseNumber(l2).toInt
          l2.ws()
          val count = parseNumber(l2).toInt
          if (count < 0 || count > 1000000) l2.fail("bad xref count")
          (0 until count).foreach { k =>
            l2.ws()
            val o = parseNumber(l2).toInt
            l2.ws()
            parseNumber(l2) // generation
            l2.ws()
            val tpe = l2.ch
            l2.i += 1
            if (tpe == 'n' && !known(start + k)) offsets(start + k) = o
            else if (tpe != 'n' && tpe != 'f') l2.fail("bad xref type")
          }
        }
      }
      l2.expect("trailer")
      parseValue(l2) match {
        case VDict(m) => m
        case _ => l2.fail("trailer dict expected")
      }
    }

    private def known(n: Int): Boolean =
      offsets.contains(n) || compressed.contains(n)

    /** PDF 1.5 cross-reference STREAM section (the modern layout):
      * `N G obj << /Type /XRef /W [...] ... >> stream` with binary
      * entries, optionally /Index subsections and PNG-predicted Flate
      * data. Its dict doubles as the trailer. Returns that dict.
      */
    private def buildXrefStream(l2: Lexer): Map[String, V] = {
      parseNumber(l2) // object number
      l2.ws(); parseNumber(l2) // generation
      l2.expect("obj")
      val dict = parseValue(l2) match {
        case VDict(m) => m
        case _ => l2.fail("xref stream dict expected")
      }
      if (!dict.get("Type").contains(VName("XRef")))
        throw new PdfError("startxref target is neither xref table nor /XRef stream")
      l2.ws()
      if (!l2.peek("stream")) l2.fail("xref stream data expected")
      l2.i += "stream".length
      if (!l2.eof && l2.ch == '\r') l2.i += 1
      if (!l2.eof && l2.ch == '\n') l2.i += 1
      val data = decodeStream(dict, l2.i, resolveEarly = true)
      val w = dict.get("W") match {
        case Some(VArr(xs)) => xs.map {
          case VNum(v) => v.toInt
          case _ => throw new PdfError("bad /W entry")
        }
        case _ => throw new PdfError("no /W")
      }
      if (w.length < 3 || w.exists(x => x < 0 || x > 8))
        throw new PdfError("bad /W widths")
      val size = dict.get("Size") match {
        case Some(VNum(v)) => v.toInt
        case _ => throw new PdfError("no /Size")
      }
      val index: Seq[(Int, Int)] = dict.get("Index") match {
        case Some(VArr(xs)) =>
          val nums = xs.map {
            case VNum(v) => v.toInt
            case _ => throw new PdfError("bad /Index")
          }
          if (nums.length % 2 != 0) throw new PdfError("odd /Index")
          nums.grouped(2).map(p => (p(0), p(1))).toSeq
        case _ => Seq((0, size))
      }
      val rowLen = w.sum
      var pos = 0
      def field(width: Int): Long = {
        var v = 0L
        (0 until width).foreach { _ =>
          v = (v << 8) | (data(pos).toLong & 0xff); pos += 1
        }
        v
      }
      index.foreach { case (start, count) =>
        if (count < 0 || count > 1000000) throw new PdfError("bad /Index count")
        (0 until count).foreach { k =>
          if (pos + rowLen > data.length) throw new PdfError("xref stream short")
          val tpe = if (w(0) == 0) 1L else field(w(0))
          val f2 = field(w(1))
          val f3 = field(w(2))
          val num = start + k
          tpe match {
            case 1 => if (!known(num)) offsets(num) = f2.toInt
            case 2 => if (!known(num)) compressed(num) = (f2.toInt, f3.toInt)
            case _ => // type 0 (free) and unknown types: ignored per spec
          }
        }
      }
      dict
    }

    // objects currently being loaded: a reference CYCLE (obj 1 → obj 2
    // → obj 1, or an ObjStm whose xref entry points into itself) must
    // fail as PdfError, never recurse to StackOverflowError (which
    // extract's Exception catch would not contain)
    private val loading = scala.collection.mutable.Set[Int]()

    /** (value, stream-data start or -1). ObjStm members parse out of
      * their decoded object stream (always (value, -1): streams cannot
      * nest inside object streams per spec).
      */
    def obj(num: Int): (V, Int) = objCache.get(num) match {
      case Some(v) => v
      case None =>
        if (!loading.add(num)) throw new PdfError(s"object cycle at $num")
        try {
          val v = loadObj(num)
          objCache(num) = v
          v
        } finally loading.remove(num)
    }

    private def loadObj(num: Int): (V, Int) = ({
      offsets.get(num) match {
        case Some(off) =>
          val lx = new Lexer(s)
          lx.i = off
          lx.ws()
          val n2 = parseNumber(lx).toInt
          if (n2 != num) lx.fail(s"xref points to obj $n2, wanted $num")
          lx.ws(); parseNumber(lx) // generation
          lx.expect("obj")
          val v = parseValue(lx)
          lx.ws()
          if (lx.peek("stream")) {
            lx.i += "stream".length
            if (!lx.eof && lx.ch == '\r') lx.i += 1
            if (!lx.eof && lx.ch == '\n') lx.i += 1
            (v, lx.i)
          } else (v, -1)
        case None =>
          val (stmNum, idx) = compressed.getOrElse(num,
            throw new PdfError(s"no obj $num"))
          val (decoded, pairs, first) = objStmCache.getOrElseUpdate(stmNum, {
            val (sv, ds) = obj(stmNum)
            val sd = sv match {
              case VDict(m) => m
              case _ => throw new PdfError("ObjStm without dict")
            }
            if (!sd.get("Type").contains(VName("ObjStm")))
              throw new PdfError("compressed ref into a non-ObjStm")
            if (ds < 0) throw new PdfError("ObjStm without stream data")
            val data = new String(
              decodeStream(sd, ds, resolveEarly = false, encObj = stmNum),
              java.nio.charset.StandardCharsets.ISO_8859_1)
            val n = sd.get("N") match {
              case Some(VNum(v)) => v.toInt
              case _ => throw new PdfError("ObjStm missing /N")
            }
            val first = sd.get("First") match {
              case Some(VNum(v)) => v.toInt
              case _ => throw new PdfError("ObjStm missing /First")
            }
            val hl = new Lexer(data)
            val pairs = Vector.newBuilder[(Int, Int)]
            (0 until n).foreach { _ =>
              hl.ws()
              val on = parseNumber(hl).toInt
              hl.ws()
              val oo = parseNumber(hl).toInt
              pairs += ((on, oo))
            }
            (data, pairs.result(), first)
          })
          if (idx < 0 || idx >= pairs.length)
            throw new PdfError("ObjStm index out of range")
          val (objNum, objOff) = pairs(idx)
          if (objNum != num) throw new PdfError("ObjStm header disagrees with xref")
          val ol = new Lexer(decoded)
          ol.i = first + objOff
          (parseValue(ol), -1)
      }
    })

    def resolve(v: V): V = resolveN(v, 0)

    @scala.annotation.tailrec
    private def resolveN(v: V, d: Int): V = v match {
      case VRef(n, _) =>
        // a ref CHAIN cycle (1 0 R → 2 0 R → 1 0 R) resolves through
        // the cache without re-entering obj(), so the loading guard
        // alone cannot catch it — bound the chain length
        if (d > 64) throw new PdfError("reference chain too deep")
        else resolveN(obj(n)._1, d + 1)
      case other => other
    }

    /** Decode a stream's data given its dict and raw-data start:
      * /Length framing (indirect allowed except while the xref itself
      * is being built), /FlateDecode, and /DecodeParms PNG predictors.
      */
    def decodeStream(dict: Map[String, V], dataStart: Int,
        resolveEarly: Boolean, encObj: Int = -1): Array[Byte] = {
      val lenV = dict.getOrElse("Length", throw new PdfError("no /Length"))
      val len = (if (resolveEarly) lenV else resolve(lenV)) match {
        case VNum(l) => l.toInt
        case _ => throw new PdfError("bad /Length")
      }
      if (len < 0 || dataStart + len > s.length)
        throw new PdfError("stream overruns file")
      val raw0 = s.substring(dataStart, dataStart + len)
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      // encryption is the OUTERMOST layer: decrypt before filters. The
      // xref stream itself (encObj = -1, built before arming) is never
      // encrypted by spec; ObjStm members inherit their container's
      // decryption and are not re-encrypted individually.
      val raw = cryptKey match {
        case Some((key, aes)) if encObj >= 0 =>
          PdfCrypt.decrypt(key, encObj, 0, aes, raw0)
        case _ => raw0
      }
      // Filter may be a single name or an array applied IN ORDER
      // (ISO 32000-1 §7.3.8.2); DecodeParms is a single dict (one
      // filter) or an array parallel to the filter array, with null
      // placeholders allowed for parameterless stages.
      val filters: Vector[String] =
        dict.get("Filter").map(f => if (resolveEarly) f else resolve(f)) match {
          case None => Vector.empty
          case Some(VName(n)) => Vector(n)
          case Some(VArr(items)) => items.map {
            case VName(n) => n
            case r: VRef if !resolveEarly => resolve(r) match {
              case VName(n) => n
              case _ => throw new PdfError("bad /Filter entry")
            }
            case _ => throw new PdfError("bad /Filter entry")
          }
          case Some(_) => throw new PdfError("bad /Filter")
        }
      val parmsV = dict.get("DecodeParms")
        .map(p => if (resolveEarly) p else resolve(p))
      def parmsAt(i: Int): Map[String, V] = parmsV match {
        case Some(VDict(m)) if filters.length == 1 => m
        case Some(VArr(items)) if i < items.length =>
          (if (resolveEarly) items(i) else resolve(items(i))) match {
            case VDict(m) => m
            case _ => Map.empty
          }
        case _ => Map.empty
      }
      def intParm(m: Map[String, V], k: String, dflt: Int): Int = m.get(k) match {
        case Some(VNum(v)) => v.toInt
        case _ => dflt
      }
      // PNG predictor post-pass (predictors 10–15); 1 = none, 2 = TIFF
      // (not emitted by the Flate/LZW writers this envelope accepts)
      def unpredict(data: Array[Byte], m: Map[String, V]): Array[Byte] = {
        val pred = intParm(m, "Predictor", 1)
        if (pred < 10) data
        else {
          val columns = intParm(m, "Columns", 1)
          val colors = intParm(m, "Colors", 1)
          val bpc = intParm(m, "BitsPerComponent", 8)
          pngUnpredict(data, columns, math.max(1, colors * bpc / 8))
        }
      }
      var data = raw
      var fi = 0
      while (fi < filters.length) {
        val pm = parmsAt(fi)
        data = filters(fi) match {
          case "FlateDecode" => unpredict(inflate(data), pm)
          case "LZWDecode" =>
            unpredict(lzwDecode(data, intParm(pm, "EarlyChange", 1) != 0), pm)
          case "ASCIIHexDecode" => asciiHexDecode(data)
          case "ASCII85Decode" => ascii85Decode(data)
          case _ => throw new PdfError("unsupported filter")
        }
        fi += 1
      }
      data
    }

    def streamBytes(num: Int): Array[Byte] = {
      val (v, dataStart) = obj(num)
      val dict = v match {
        case VDict(m) => m
        case _ => throw new PdfError("stream obj without dict")
      }
      if (dataStart < 0) throw new PdfError("not a stream")
      decodeStream(dict, dataStart, resolveEarly = false, encObj = num)
    }

    /** (dict, JPEG bytes) when object `num` is an /Image XObject whose
      * FINAL filter is DCTDecode. The DCT stage is dropped from the
      * filter chain and everything BEFORE it (encryption, wrapping
      * Flate/ASCII stages) decodes normally, so what returns is the
      * undecoded JPEG file itself. None for non-Image XObjects and for
      * images stored any other way (raw rasters) — skipped by the
      * extraction envelope, not errors.
      */
    def imageJpeg(num: Int): Option[(Map[String, V], Array[Byte])] = {
      val (v, dataStart) = obj(num)
      val dict = v match {
        case VDict(m) => m
        case _ => throw new PdfError("xobject without dict")
      }
      if (dataStart < 0) throw new PdfError("xobject is not a stream")
      if (!dict.get("Subtype").map(resolve).contains(VName("Image"))) None
      else {
        val fl: Vector[String] = dict.get("Filter").map(resolve) match {
          case None => Vector.empty
          case Some(VName(n)) => Vector(n)
          case Some(VArr(items)) => items.map(resolve).map {
            case VName(n) => n
            case _ => throw new PdfError("bad /Filter entry")
          }
          case Some(_) => throw new PdfError("bad /Filter")
        }
        if (!fl.lastOption.contains("DCTDecode")) None
        else {
          val kept = fl.dropRight(1)
          val parms = dict.get("DecodeParms").map(resolve) match {
            // array form is filter-parallel: drop the DCT slot with it
            case Some(VArr(items)) => Some(VArr(items.dropRight(1)))
            case other => other
          }
          val stripped =
            if (kept.isEmpty) dict - "Filter" - "DecodeParms"
            else dict ++ Map[String, V]("Filter" ->
              (if (kept.length == 1) VName(kept.head)
               else VArr(kept.map(VName(_): V)))) ++
              parms.map("DecodeParms" -> _)
          Some((dict,
            decodeStream(stripped, dataStart, resolveEarly = false, encObj = num)))
        }
      }
    }

    /** Validate /Encrypt (ISO 32000-1 §7.6 standard handler) with the
      * EMPTY user password and arm stream decryption. Out-of-envelope
      * forms — non-Standard handlers, /V 5, unknown /CFM, a document
      * whose user password is genuinely non-empty — all throw PdfError,
      * which the extract envelope turns into a clean None. The /Encrypt
      * dict and /ID are never themselves encrypted, so resolving them
      * before arming is safe by spec.
      */
    def setupEncryption(): Unit = trailer.get("Encrypt").foreach { ev =>
      val ed = resolve(ev) match {
        case VDict(m) => m
        case _ => throw new PdfError("bad /Encrypt")
      }
      if (!ed.get("Filter").contains(VName("Standard")))
        throw new PdfError("unsupported security handler")
      def intOf(k: String, dflt: Int): Int = ed.get(k) match {
        case Some(VNum(x)) => x.toInt
        case None => dflt
        case _ => throw new PdfError(s"bad /$k")
      }
      def strOf(k: String): Array[Byte] = ed.get(k) match {
        case Some(VStr(x)) =>
          x.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        case _ => throw new PdfError(s"missing /$k")
      }
      val v = intOf("V", 0)
      val r = intOf("R", 2)
      val p = ed.get("P") match {
        case Some(VNum(x)) => x.toLong.toInt // signed 32-bit permissions
        case _ => throw new PdfError("missing /P")
      }
      val encMeta = ed.get("EncryptMetadata") match {
        case Some(VBool(b)) => b
        case _ => true
      }
      // /CF /StdCF /CFM names the stream cipher for V ≥ 4
      def cfmName: Option[V] = for {
        cf <- ed.get("CF").map(resolve)
        std <- cf match {
          case VDict(m) => m.get("StdCF").map(resolve)
          case _ => None
        }
        m <- std match {
          case VDict(mm) => mm.get("CFM")
          case _ => None
        }
      } yield m
      if (v == 5) {
        // AES-256: R 6 (ISO 32000-2 §7.6.4) or the pre-2.0 R 5 form.
        // The file key is not password-derived — it is unwrapped from
        // /UE after the password hash validates against /U, then the
        // /Perms block must round-trip under it (validate, don't trust).
        if (r != 5 && r != 6) throw new PdfError("unsupported /R for /V 5")
        cfmName match {
          case Some(VName("AESV3")) => ()
          case _ => throw new PdfError("unsupported crypt filter")
        }
        if (intOf("Length", 256) != 256) throw new PdfError("bad /Length")
        val key = PdfCrypt.fileKeyV5(Array.empty, strOf("U"), strOf("UE"), r)
          .getOrElse(throw new PdfError("encrypted with a non-empty user password"))
        if (!PdfCrypt.checkPermsV5(key, strOf("Perms"), p, encMeta))
          throw new PdfError("bad /Perms")
        cryptKey = Some((key, true))
      } else {
        val aes = v match {
          case 1 | 2 => false
          case 4 =>
            cfmName match {
              case Some(VName("AESV2")) => true
              case Some(VName("V2")) => false
              case _ => throw new PdfError("unsupported crypt filter")
            }
          case _ => throw new PdfError("unsupported /V")
        }
        val n = if (v == 1) 5 else {
          val bits = intOf("Length", 40)
          if (bits < 40 || bits > 128 || bits % 8 != 0)
            throw new PdfError("bad /Length")
          bits / 8
        }
        val id0 = trailer.get("ID") match {
          case Some(VArr(xs)) if xs.nonEmpty => xs.head match {
            case VStr(x) =>
              x.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
            case _ => Array.empty[Byte]
          }
          case _ => Array.empty[Byte]
        }
        val key = PdfCrypt.fileKey(Array.empty, strOf("O"), p, id0, r, n, encMeta)
        if (!PdfCrypt.checkUser(key, strOf("U"), id0, r))
          throw new PdfError("encrypted with a non-empty user password")
        cryptKey = Some((key, aes))
      }
    }
  }

  /** Reverse the PNG row filters (predictors 10–15: the per-row tag
    * byte selects None/Sub/Up/Average/Paeth) — the standard encoding
    * for xref-stream data.
    */
  private[graft] def pngUnpredict(d: Array[Byte], columns: Int,
      bpp: Int): Array[Byte] = {
    val rowLen = columns * bpp
    if (rowLen <= 0 || d.length % (rowLen + 1) != 0)
      throw new PdfError("bad predictor geometry")
    val rows = d.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    var prevOff = -rowLen
    (0 until rows).foreach { r =>
      val tag = d(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      (0 until rowLen).foreach { i =>
        val x = d(src + i) & 0xff
        val a = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val b = if (prevOff >= 0) out(prevOff + i) & 0xff else 0
        val c = if (i >= bpp && prevOff >= 0) out(prevOff + i - bpp) & 0xff else 0
        val v = tag match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => throw new PdfError(s"bad predictor tag $tag")
        }
        out(dst + i) = (v & 0xff).toByte
      }
      prevOff = dst
    }
    out
  }

  private def inflate(in: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(in.length * 4 + 64)
    val buf = new Array[Byte](8192)
    var guard = 0
    while (!inf.finished() && guard < (1 << 16)) {
      guard += 1
      val k = inf.inflate(buf)
      // needsDictionary() also yields k == 0 with needsInput() false —
      // reject rather than spin; preset dictionaries are out of envelope
      if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
        throw new PdfError("truncated or dictionary-preset flate stream")
      out.write(buf, 0, k)
    }
    // guard expiry (a >512 MiB inflation = a flate bomb for this
    // envelope) must REJECT — returning the partial buffer would hand
    // downstream silently truncated page text instead of None
    if (!inf.finished()) { inf.end(); throw new PdfError("flate stream too large") }
    inf.end()
    out.toByteArray
  }

  /** LZWDecode (ISO 32000-1 §7.4.4 — the TIFF LZW variant): MSB-first
    * variable-width codes starting at 9 bits; 256 = ClearTable, 257 =
    * EOD; the code width grows at 511/1023/2047 table entries under the
    * default EarlyChange = 1 (one entry before the power of two — the
    * off-by-one the spec inherited from TIFF) or at 512/1024/2048 with
    * EarlyChange = 0. Growth beyond 12 bits without a clear, a code
    * beyond the table frontier, or a first-code that is not a literal
    * all reject — and the same >512 MiB expansion bound as [[inflate]]
    * applies (an LZW bomb is ~1000× per KiB).
    */
  private[graft] def lzwDecode(in: Array[Byte], earlyChange: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 4 + 64)
    // table entries 0–255 are the literals; 256/257 reserved; dynamic
    // entries stored as (prefix code, appended byte) to stay O(1) per add
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = 258
    var width = 9
    def entryBytes(code: Int): Array[Byte] = {
      if (code < 256) return Array(code.toByte)
      var n = 0
      var c = code
      while (c >= 258) { n += 1; c = prefix(c) }
      val buf = new Array[Byte](n + 1)
      buf(0) = c.toByte
      c = code
      var i = n
      while (i >= 1) { buf(i) = append(c); c = prefix(c); i -= 1 }
      buf
    }
    var acc = 0L
    var bits = 0
    var pos = 0
    var prev = -1
    var done = false
    while (!done) {
      while (bits < width && pos < in.length) {
        acc = (acc << 8) | (in(pos) & 0xffL); bits += 8; pos += 1
      }
      if (bits < width) throw new PdfError("truncated LZW stream")
      val code = ((acc >>> (bits - width)) & ((1L << width) - 1)).toInt
      bits -= width
      if (code == 257) done = true
      else if (code == 256) { next = 258; width = 9; prev = -1 }
      else if (prev < 0) {
        if (code >= 256) throw new PdfError("LZW first code not a literal")
        out.write(code); prev = code
      } else {
        val emitted: Array[Byte] =
          if (code < 256) Array(code.toByte)
          else if (code < next) entryBytes(code)
          else if (code == next) { // the KwKwK case
            val p = entryBytes(prev)
            val b = java.util.Arrays.copyOf(p, p.length + 1)
            b(p.length) = p(0)
            b
          } else throw new PdfError("LZW code beyond table")
        out.write(emitted, 0, emitted.length)
        if (next < 4096) {
          prefix(next) = prev; append(next) = emitted(0); next += 1
          val limit = (1 << width) - (if (earlyChange) 1 else 0)
          if (next >= limit && width < 12) width += 1
          else if (next == 4096) throw new PdfError("LZW table overflow without clear")
        }
        prev = code
        if (out.size() > (1 << 29)) throw new PdfError("LZW stream too large")
      }
      if (!done && pos >= in.length && bits < width)
        throw new PdfError("LZW stream missing EOD")
    }
    out.toByteArray
  }

  /** ASCIIHexDecode (ISO 32000-1 §7.4.2): hex digit pairs, whitespace
    * ignored, `>` is EOD, an odd trailing digit completes with 0.
    */
  private[graft] def asciiHexDecode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 8)
    var hi = -1
    var i = 0
    var done = false
    while (i < in.length && !done) {
      val c = in(i) & 0xff
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c == '>') { done = true; -1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0) -1
        else throw new PdfError("bad ASCIIHex character")
      if (d >= 0) {
        if (hi < 0) hi = d
        else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (!done) throw new PdfError("ASCIIHex missing EOD")
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** ASCII85Decode (ISO 32000-1 §7.4.3): 5-char groups `!`–`u` encode a
    * big-endian 32-bit word base 85; `z` alone is a 4-zero-byte group;
    * whitespace ignored; `~>` is EOD; a trailing partial group of n
    * chars (n ≥ 2) pads with `u` and keeps n−1 bytes. A group value
    * above 2^32−1 or a `z` inside a group rejects.
    */
  private[graft] def ascii85Decode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 4 / 5 + 8)
    val grp = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    def flush(chars: Int): Unit = {
      var v = 0L
      var j = 0
      while (j < 5) { v = v * 85 + (if (j < chars) grp(j) else 84); j += 1 }
      if (v > 0xffffffffL) throw new PdfError("ASCII85 group out of range")
      val keep = chars - 1
      var k = 0
      while (k < keep) { out.write(((v >>> (24 - 8 * k)) & 0xff).toInt); k += 1 }
    }
    while (i < in.length && !done) {
      val c = in(i) & 0xff
      if (c == '~') {
        if (i + 1 >= in.length || in(i + 1) != '>')
          throw new PdfError("bad ASCII85 EOD")
        done = true
      } else if (c == 'z') {
        if (n != 0) throw new PdfError("z inside ASCII85 group")
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0) {
        () // whitespace
      } else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'; n += 1
        if (n == 5) { flush(5); n = 0 }
      } else throw new PdfError("bad ASCII85 character")
      i += 1
    }
    if (!done) throw new PdfError("ASCII85 missing EOD")
    if (n == 1) throw new PdfError("single trailing ASCII85 character")
    if (n >= 2) flush(n)
    out.toByteArray
  }

  // ---------------- fonts: non-latin decode (r10) ----------------

  /** Per-font show-string decode state. `twoByte` = composite
    * (Type0/Identity-H) 2-byte codes; `toUni` maps a character code to
    * its Unicode string (from /ToUnicode, overriding /Encoding
    * /Differences glyph names where both define a code). An empty map
    * on a 1-byte font means identity latin-1 (the classic envelope).
    */
  final case class PdfFont(twoByte: Boolean, toUni: Map[Int, String])

  /** Glyph name → Unicode for /Differences arrays: the AGL `uniXXXX`
    * (one or more 4-hex groups = UTF-16 code units) and `uXXXX[XX]`
    * conventions, single-char names (AGL maps /a → "a"), plus the
    * punctuation names the fixtures and common re-encoded fonts use.
    * Unknown names return None — that code keeps its latin-1 fallback.
    */
  private[graft] def glyphToUnicode(name: String): Option[String] = {
    def hexVal(h: String): Option[Int] =
      if (h.nonEmpty && h.forall(c => Character.digit(c, 16) >= 0))
        Some(Integer.parseInt(h, 16))
      else None
    if (name.length == 1) Some(name)
    else if (name.startsWith("uni") && name.length > 3 &&
        (name.length - 3) % 4 == 0) {
      val groups = (3 until name.length by 4).map(o => hexVal(name.substring(o, o + 4)))
      if (groups.forall(_.isDefined))
        Some(groups.flatten.map(_.toChar).mkString)
      else None
    } else if (name.length >= 5 && name.length <= 7 && name.charAt(0) == 'u' &&
        !name.startsWith("uni")) {
      hexVal(name.substring(1)).filter(Character.isValidCodePoint)
        .map(cp => new String(Character.toChars(cp)))
    } else Map(
      "space" -> " ", "period" -> ".", "comma" -> ",", "hyphen" -> "-",
      "colon" -> ":", "semicolon" -> ";", "quotesingle" -> "'",
      "quotedbl" -> "\"", "parenleft" -> "(", "parenright" -> ")",
      "slash" -> "/", "exclam" -> "!", "question" -> "?").get(name)
  }

  /** /Encoding /Differences array → code map: a number sets the current
    * code, each following name maps it and increments (ISO 32000
    * §9.6.6.3). Codes outside 0..255 or non-number/name members reject.
    */
  private def buildDifferences(xs: Vector[V]): Map[Int, String] = {
    val m = scala.collection.mutable.HashMap[Int, String]()
    var code = -1
    xs.foreach {
      case VNum(v) =>
        code = v.toInt
        if (code < 0 || code > 255) throw new PdfError("differences code out of range")
      case VName(g) =>
        if (code < 0 || code > 255) throw new PdfError("differences name before code")
        glyphToUnicode(g).foreach(u => m(code) = u)
        code += 1
      case _ => throw new PdfError("bad differences member")
    }
    m.toMap
  }

  /** /ToUnicode CMap (ISO 32000 §9.10.3 / Adobe CMap spec subset):
    * `bfchar` pairs and `bfrange` triples (continuous-destination and
    * array forms), source codes ≤ 2 bytes, destinations UTF-16BE hex.
    * Bounded: ≤ 65536 mapped codes, else reject (zip-bomb guard, the
    * inflate tradition).
    */
  private[graft] def parseCMap(bytes: Array[Byte]): Map[Int, String] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    // tokenize: hex strings, array brackets, bare keywords; names,
    // numbers and delimiters that CMap postscript carries are skipped
    // or kept as opaque words (only the bf sections are interpreted)
    val toks = scala.collection.mutable.ArrayBuffer[AnyRef]()
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%') { while (i < n && s.charAt(i) != '\n') i += 1 }
      else if (c == '<') {
        val e = s.indexOf('>', i + 1)
        if (e < 0) throw new PdfError("EOF in cmap hex")
        toks += ("#" + s.substring(i + 1, e).filterNot(_.isWhitespace))
        i = e + 1
      } else if (c == '[' || c == ']') { toks += c.toString; i += 1 }
      else if (c == '/' ) {
        i += 1
        while (i < n && !isDelim(s.charAt(i)) && !Character.isWhitespace(s.charAt(i))) i += 1
      } else if (Character.isWhitespace(c)) i += 1
      else if (isDelim(c)) i += 1
      else {
        val st = i
        while (i < n && !isDelim(s.charAt(i)) && !Character.isWhitespace(s.charAt(i))) i += 1
        toks += s.substring(st, i)
      }
    }
    def hexCode(t: AnyRef): Int = t match {
      case h: String if h.startsWith("#") && h.length >= 2 && h.length <= 5 =>
        Integer.parseInt(h.substring(1), 16)
      case _ => throw new PdfError("bad cmap source code")
    }
    def hexDst(t: AnyRef): String = t match {
      case h: String if h.startsWith("#") && h.length % 2 == 1 =>
        val hx = h.substring(1)
        val b = new Array[Byte](hx.length / 2)
        var k = 0
        while (k < b.length) {
          b(k) = Integer.parseInt(hx.substring(2 * k, 2 * k + 2), 16).toByte
          k += 1
        }
        new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
      case _ => throw new PdfError("bad cmap destination")
    }
    /** dst for the idx-th code of a continuous bfrange: last UTF-16
      * code unit increments (Adobe CMap spec rule). */
    def bump(dst: String, idx: Int): String =
      if (idx == 0 || dst.isEmpty) dst
      else dst.substring(0, dst.length - 1) +
        (dst.charAt(dst.length - 1) + idx).toChar
    val m = scala.collection.mutable.HashMap[Int, String]()
    def guard(): Unit =
      if (m.size > 65536) throw new PdfError("cmap too large")
    var j = 0
    while (j < toks.length) {
      toks(j) match {
        case "beginbfchar" =>
          j += 1
          while (j < toks.length && toks(j) != "endbfchar") {
            if (j + 1 >= toks.length) throw new PdfError("truncated bfchar")
            m(hexCode(toks(j))) = hexDst(toks(j + 1))
            guard()
            j += 2
          }
          if (j >= toks.length) throw new PdfError("unterminated bfchar")
          j += 1
        case "beginbfrange" =>
          j += 1
          while (j < toks.length && toks(j) != "endbfrange") {
            if (j + 2 >= toks.length) throw new PdfError("truncated bfrange")
            val lo = hexCode(toks(j))
            val hi = hexCode(toks(j + 1))
            if (hi < lo || hi - lo > 65535) throw new PdfError("bad bfrange span")
            toks(j + 2) match {
              case "[" =>
                j += 3
                var c = lo
                while (j < toks.length && toks(j) != "]") {
                  if (c > hi) throw new PdfError("bfrange array too long")
                  m(c) = hexDst(toks(j)); guard()
                  c += 1; j += 1
                }
                if (j >= toks.length) throw new PdfError("unterminated bfrange array")
                j += 1
              case _ =>
                val dst = hexDst(toks(j + 2))
                var c = lo
                while (c <= hi) { m(c) = bump(dst, c - lo); c += 1 }
                guard()
                j += 3
            }
          }
          if (j >= toks.length) throw new PdfError("unterminated bfrange")
          j += 1
        case _ => j += 1
      }
    }
    m.toMap
  }

  /** Show-string decode through the current font. No font (or a plain
    * 1-byte font with no mappings): the UTF-16BE BOM convention applies
    * — a string starting FE FF decodes as UTF-16BE (ISO 32000 §7.9.2.2
    * text-string rule) — else raw latin-1 (the classic envelope). A
    * mapped 1-byte font falls back to latin-1 per unmapped code; a
    * 2-byte composite font yields U+FFFD per unmapped code (no latin-1
    * meaning exists for a CID) and tolerates an odd trailing byte.
    */
  private[graft] def decodeShown(raw: String, f: PdfFont): String = {
    def default(t: String): String =
      if (t.length >= 2 && t.charAt(0) == 0xfe.toChar && t.charAt(1) == 0xff.toChar) {
        val sb = new java.lang.StringBuilder((t.length - 2) / 2)
        var i = 2
        while (i + 1 < t.length) {
          sb.append(((t.charAt(i) << 8) | t.charAt(i + 1)).toChar)
          i += 2
        }
        sb.toString
      } else t
    if (f == null) default(raw)
    else if (f.twoByte) {
      val sb = new java.lang.StringBuilder(raw.length / 2)
      var i = 0
      while (i + 1 < raw.length) {
        val code = (raw.charAt(i) << 8) | raw.charAt(i + 1)
        sb.append(f.toUni.getOrElse(code, "�"))
        i += 2
      }
      sb.toString
    } else if (f.toUni.isEmpty) default(raw)
    else raw.map(c => f.toUni.getOrElse(c.toInt, c.toString)).mkString
  }

  // ---------------- page tree + content ----------------

  /** Per-page extracted text (lines joined with \n), document order;
    * None on anything out of envelope or malformed. Never throws.
    */
  /** Parse the document and walk the page tree: the built [[Doc]] plus
    * every page dict with its (inherited) /Resources, in document
    * order. Throws on malformed structure — callers wrap in the
    * never-throws envelope. Shared by [[extract]] and
    * [[extractImages]].
    */
  private def openPages(raw: Array[Byte]): (Doc, Vector[(Map[String, V], Option[V])]) = {
    val doc = new Doc(raw)
    doc.build()
    doc.setupEncryption()
    val root = doc.resolve(doc.trailer.getOrElse("Root", throw new PdfError("no /Root")))
    val pagesRef = root match {
      case VDict(m) => m.getOrElse("Pages", throw new PdfError("no /Pages"))
      case _ => throw new PdfError("bad catalog")
    }
    val pages = Vector.newBuilder[(Map[String, V], Option[V])]
    val seen = scala.collection.mutable.Set[Int]()
    // /Resources inherits down the page tree (ISO 32000 §7.7.3.4)
    def walk(v: V, inheritedRes: Option[V]): Unit = {
      val node = doc.resolve(v) match {
        case VDict(m) => m
        case _ => throw new PdfError("bad page-tree node")
      }
      v match {
        case VRef(n, _) =>
          if (seen.contains(n)) throw new PdfError("cyclic page tree")
          seen += n
        case _ =>
      }
      val res = node.get("Resources").orElse(inheritedRes)
      node.get("Type").map(doc.resolve) match {
        case Some(VName("Pages")) =>
          doc.resolve(node.getOrElse("Kids", throw new PdfError("no /Kids"))) match {
            case VArr(kids) => kids.foreach(walk(_, res))
            case _ => throw new PdfError("bad /Kids")
          }
        case Some(VName("Page")) => pages += ((node, res))
        case _ => throw new PdfError("bad node type")
      }
    }
    walk(pagesRef, None)
    (doc, pages.result())
  }

  /** One embedded image: page index, resource name, /Width × /Height
    * from the XObject dict, and the UNDECODED JPEG bytes — handed to
    * the image pipeline's own decoders (Multimodal), not re-decoded
    * here.
    */
  final case class PdfImage(page: Int, name: String, width: Int,
      height: Int, jpeg: Array[Byte])

  /** Extract embedded image XObjects whose FINAL filter is /DCTDecode —
    * the embedded-JPEG form virtually all real PDF photographs use
    * (the figure-extraction stage of a multimodal corpus pipeline).
    * Earlier filters and encryption apply first; the JPEG itself is
    * returned undecoded. Non-DCT images (raw rasters) are SKIPPED, not
    * errors: an extraction stage extracts what downstream can consume,
    * and page-text extraction is independent of either outcome. Images
    * emit in (page, resource-name) order. Same never-throws envelope
    * as [[extract]]: None on any malformed structure.
    */
  def extractImages(raw: Array[Byte]): Option[Seq[PdfImage]] = {
    try {
      val (doc, pagesV) = openPages(raw)
      val out = Vector.newBuilder[PdfImage]
      pagesV.zipWithIndex.foreach { case ((_, res), pi) =>
        res.map(doc.resolve) match {
          case Some(VDict(rm)) => rm.get("XObject").map(doc.resolve) match {
            case Some(VDict(xm)) => xm.toVector.sortBy(_._1).foreach {
              case (nm, xv) =>
                val nr = xv match {
                  case VRef(n, _) => n
                  case _ => throw new PdfError("xobject must be a stream ref")
                }
                doc.imageJpeg(nr).foreach { case (xd, jpeg) =>
                  def dim(k: String): Int = xd.get(k).map(doc.resolve) match {
                    case Some(VNum(x)) if x >= 0 && x <= Int.MaxValue => x.toInt
                    case _ => throw new PdfError(s"bad /$k")
                  }
                  out += PdfImage(pi, nm, dim("Width"), dim("Height"), jpeg)
                }
            }
            case None =>
            case _ => throw new PdfError("bad /XObject")
          }
          case None =>
          case _ => throw new PdfError("bad /Resources")
        }
      }
      Some(out.result())
    } catch { case _: Exception => None }
  }

  def extract(raw: Array[Byte]): Option[Seq[String]] = {
    try {
      val (doc, pagesV) = openPages(raw)

      // Font dicts shared across pages build once (keyed by object num)
      val fontCache = scala.collection.mutable.HashMap[Int, PdfFont]()
      def buildFont(fv: V): PdfFont = {
        val fd = doc.resolve(fv) match {
          case VDict(m) => m
          case _ => throw new PdfError("bad font object")
        }
        val isType0 = fd.get("Subtype").map(doc.resolve).contains(VName("Type0"))
        if (isType0) doc.resolve(fd.getOrElse("Encoding", VNull)) match {
          case VName("Identity-H") | VName("Identity-V") =>
          case _ => throw new PdfError("unsupported composite-font encoding")
        }
        val diffs: Map[Int, String] =
          if (isType0) Map.empty
          else doc.resolve(fd.getOrElse("Encoding", VNull)) match {
            case VDict(em) => em.get("Differences").map(doc.resolve) match {
              case Some(VArr(xs)) => buildDifferences(xs)
              case None => Map.empty
              case _ => throw new PdfError("bad /Differences")
            }
            case _ => Map.empty // a base-encoding name: latin-1 envelope
          }
        val toUni: Map[Int, String] = fd.get("ToUnicode") match {
          case Some(VRef(nr, _)) => parseCMap(doc.streamBytes(nr))
          case None => Map.empty
          case _ => throw new PdfError("ToUnicode must be a stream ref")
        }
        PdfFont(isType0, diffs ++ toUni) // ToUnicode outranks Differences
      }
      def fontsOf(resV: Option[V]): Map[String, PdfFont] = resV match {
        case None => Map.empty
        case Some(rv) => doc.resolve(rv) match {
          case VDict(rm) => rm.get("Font").map(doc.resolve) match {
            case Some(VDict(fm)) => fm.map { case (fname, fv) =>
              fname -> (fv match {
                case VRef(nr, _) => fontCache.getOrElseUpdate(nr, buildFont(fv))
                case _ => buildFont(fv)
              })
            }
            case None => Map.empty
            case _ => throw new PdfError("bad /Font dict")
          }
          case _ => throw new PdfError("bad /Resources")
        }
      }

      Some(pagesV.map { case (page, res) =>
        val fonts = fontsOf(res)
        val content = page.get("Contents") match {
          case None => Array.emptyByteArray
          case Some(c) =>
            val parts = doc.resolve(c) match {
              case VArr(xs) => xs
              case _ => Vector(c)
            }
            val refs = parts.map {
              case VRef(n, _) => n
              case _ => throw new PdfError("contents must be stream refs")
            }
            // multiple streams concatenate with whitespace per spec
            refs.map(doc.streamBytes).reduceOption((a, b) =>
              a ++ Array('\n'.toByte) ++ b).getOrElse(Array.emptyByteArray)
        }
        contentText(new String(content,
          java.nio.charset.StandardCharsets.ISO_8859_1), fonts)
      })
    } catch { case _: Exception => None }
  }

  /** Text machine over one page's content stream (fontless form — the
    * classic latin-1 envelope; kept for the spec surface).
    */
  private[operators] def contentText(cs: String): String =
    contentText(cs, Map.empty)

  /** Text machine over one page's content stream. `fonts` maps resource
    * names (`F1`) to decode state; `Tf` selects, show operators decode
    * through the selection ([[decodeShown]]).
    */
  private[operators] def contentText(cs: String, fonts: Map[String, PdfFont]): String = {
    val lx = new Lexer(cs)
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inText = false
    var lastStr: String = null
    var lastName: String = null // last /Name operand, for Tf
    var curFont: PdfFont = null
    var num1, num2 = 0.0 // last two numbers, for Td/TD
    var inArray = false
    val arrStrs = new StringBuilder
    def newline(): Unit = {
      if (cur.nonEmpty) { lines += cur.toString; cur.clear() }
    }
    def show(t: String): Unit = if (t != null) cur.append(t)
    while (!lx.eof) {
      lx.ws()
      if (!lx.eof) lx.ch match {
        case '(' =>
          val t = decodeShown(parseLiteralString(lx), curFont)
          if (inArray) arrStrs.append(t) else lastStr = t
        case '<' if lx.i + 1 < lx.n && lx.s.charAt(lx.i + 1) == '<' =>
          parseValue(lx) // dict (e.g. marked-content properties): skip
        case '<' =>
          val t = decodeShown(parseHexString(lx), curFont)
          if (inArray) arrStrs.append(t) else lastStr = t
        case '[' => lx.i += 1; inArray = true; arrStrs.clear()
        case ']' => lx.i += 1; inArray = false
        case '/' => lastName = parseName(lx).s
        case c if c.isDigit || c == '+' || c == '-' || c == '.' =>
          val v = parseNumber(lx)
          if (!inArray) { num1 = num2; num2 = v }
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val st = lx.i
          while (!lx.eof && (lx.ch.isLetter || lx.ch == '\'' || lx.ch == '"' ||
              lx.ch == '*' || lx.ch.isDigit)) lx.i += 1
          lx.s.substring(st, lx.i) match {
            case "BT" => inText = true
            case "ET" => inText = false; newline()
            case "BI" => // inline image: skip to EI
              val e = lx.s.indexOf("EI", lx.i)
              lx.i = if (e < 0) lx.n else e + 2
            case "Tf" => // font select: /Name size Tf
              curFont = if (lastName == null) null else fonts.getOrElse(lastName, null)
            case "Tj" if inText => show(lastStr)
            case "TJ" if inText => show(arrStrs.toString)
            case "'" if inText => newline(); show(lastStr)
            case "\"" if inText => newline(); show(lastStr)
            case "Td" | "TD" if inText => if (num2 != 0.0) newline()
            case "T*" if inText => newline()
            case _ => // every other operator: positioning/color/etc.
          }
        case _ => lx.i += 1 // stray delimiter: skip
      }
    }
    newline()
    lines.result().mkString("\n")
  }

  // ---------------- encryption (r10): standard security handler ----------------

  /** ISO 32000-1 §7.6 standard security handler math, shared by the
    * reader and the fixture writer (same algorithms, opposite
    * directions — NOT copies). Covers the common crawl reality: RC4
    * (/V 2 /R 3) and AES-128-CBC (/V 4 /R 4 /CFM /AESV2) documents
    * whose USER password is empty (owner-restricted but readable —
    * the overwhelmingly dominant encrypted form in the wild). Anything
    * else — a real user password, /V 5 AES-256, a non-Standard
    * handler — rejects cleanly through the never-throws envelope.
    */
  private[graft] object PdfCrypt {
    /** The spec's 32-byte password padding constant (Algorithm 2). */
    val Pad: Array[Byte] = Array(
      0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
      0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
      0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
      0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

    def md5(parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(d.update)
      d.digest()
    }

    def padPw(pw: Array[Byte]): Array[Byte] =
      (pw ++ Pad).take(32)

    /** Plain RC4 (the spec's cipher for /V ≤ 2 and /CFM /V2). */
    def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val s = Array.tabulate(256)(_.toByte)
      var j = 0
      var i = 0
      while (i < 256) {
        j = (j + s(i) + key(i % key.length)) & 0xff
        val t = s(i); s(i) = s(j); s(j) = t
        i += 1
      }
      val out = new Array[Byte](data.length)
      var x = 0
      var y = 0
      var k = 0
      while (k < data.length) {
        x = (x + 1) & 0xff
        y = (y + s(x)) & 0xff
        val t = s(x); s(x) = s(y); s(y) = t
        out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
        k += 1
      }
      out
    }

    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    /** Algorithm 2: the file encryption key from the (padded) user
      * password, /O, /P, the first /ID element, and — R4 with
      * /EncryptMetadata false — four 0xFF bytes; R3+ re-hashes the
      * first n bytes 50 times.
      */
    def fileKey(userPw: Array[Byte], o: Array[Byte], p: Int,
        id0: Array[Byte], r: Int, n: Int, encryptMetadata: Boolean): Array[Byte] = {
      val extra =
        if (r >= 4 && !encryptMetadata) Array.fill(4)(0xff.toByte)
        else Array.empty[Byte]
      var k = md5(padPw(userPw), o, le32(p), id0, extra)
      if (r >= 3) (0 until 50).foreach(_ => k = md5(k.take(n)))
      k.take(n)
    }

    /** Algorithm 3: the /O value (writer side). */
    def ownerValue(ownerPw: Array[Byte], userPw: Array[Byte],
        r: Int, n: Int): Array[Byte] = {
      var k = md5(padPw(ownerPw))
      if (r >= 3) (0 until 50).foreach(_ => k = md5(k.take(n)))
      val key = k.take(n)
      var x = rc4(key, padPw(userPw))
      if (r >= 3) (1 to 19).foreach { i =>
        x = rc4(key.map(b => (b ^ i).toByte), x)
      }
      x
    }

    /** Algorithms 4/5: the /U value from the file key (R2: 32 bytes;
      * R3+: 16 significant bytes + 16 arbitrary — zeros here).
      */
    def userValue(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
      if (r == 2) rc4(key, Pad)
      else {
        var x = md5(Pad, id0)
        x = rc4(key, x)
        (1 to 19).foreach { i => x = rc4(key.map(b => (b ^ i).toByte), x) }
        x ++ new Array[Byte](16)
      }

    /** Algorithm 6: does the (empty-password) file key open this
      * document? R3+ compares only the 16 significant bytes.
      */
    def checkUser(key: Array[Byte], u: Array[Byte], id0: Array[Byte],
        r: Int): Boolean = {
      val expect = userValue(key, id0, r)
      val cmp = if (r == 2) 32 else 16
      u.length >= cmp && expect.take(cmp).sameElements(u.take(cmp))
    }

    // ---- /V 5 AES-256 (ISO 32000-2 §7.6.4; R 5 = the pre-2.0 Adobe
    // extension-level-3 form, R 6 = PDF 2.0) --------------------------

    private def digest(alg: String, parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance(alg)
      parts.foreach(d.update)
      d.digest()
    }
    def sha256(parts: Array[Byte]*): Array[Byte] = digest("SHA-256", parts: _*)

    /** Raw AES-CBC, no padding (the V5 key-wrap and 2.B primitive). */
    def aesCbcRaw(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
        enc: Boolean): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(if (enc) javax.crypto.Cipher.ENCRYPT_MODE
             else javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      c.doFinal(data)
    }

    /** Raw AES-ECB, no padding (the /Perms block cipher). */
    def aesEcbRaw(key: Array[Byte], data: Array[Byte],
        enc: Boolean): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      c.init(if (enc) javax.crypto.Cipher.ENCRYPT_MODE
             else javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"))
      c.doFinal(data)
    }

    /** The V5 password hash. R 5: a single SHA-256 over pwd ∥ salt ∥
      * udata. R 6: Algorithm 2.B — iterate (K1 = 64 repetitions of
      * pwd ∥ K ∥ udata; E = AES-128-CBC(K[0..15], IV = K[16..31], K1);
      * K = SHA-{256,384,512}(E) selected by the first 16 bytes of E as
      * a big-endian integer mod 3, which — since 256 ≡ 1 (mod 3) —
      * equals their byte sum mod 3) for at least 64 rounds, then until
      * E's last byte ≤ rounds − 32. `udata` is the 48-byte /U value for
      * owner-password hashes, empty for user-password hashes.
      */
    def hash2b(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte],
        r: Int): Array[Byte] = {
      var k = sha256(pwd, salt, udata)
      if (r == 5) return k
      var i = 0
      var lastE = 256 // forces the ≥64-round minimum
      while (i < 64 || lastE > i - 32) {
        val piece = pwd ++ k ++ udata
        val k1 = new Array[Byte](piece.length * 64)
        var j = 0
        while (j < 64) {
          System.arraycopy(piece, 0, k1, j * piece.length, piece.length)
          j += 1
        }
        val e = aesCbcRaw(k.take(16), k.slice(16, 32), k1, enc = true)
        lastE = e(e.length - 1) & 0xff
        var sum = 0
        var b = 0
        while (b < 16) { sum += e(b) & 0xff; b += 1 }
        k = (sum % 3) match {
          case 0 => sha256(e)
          case 1 => digest("SHA-384", e)
          case _ => digest("SHA-512", e)
        }
        i += 1
      }
      k.take(32)
    }

    /** Algorithm 2.A, user-password branch: validate `pwd` against the
      * 48-byte /U (hash ∥ validation salt ∥ key salt) and unwrap the
      * 32-byte file key from /UE (AES-256-CBC, zero IV, no padding).
      * None = the password does not open this document.
      */
    def fileKeyV5(pwd: Array[Byte], u: Array[Byte], ue: Array[Byte],
        r: Int): Option[Array[Byte]] = {
      if (u.length < 48 || ue.length != 32) throw new PdfError("bad /U or /UE")
      val hash = u.take(32)
      val vSalt = u.slice(32, 40)
      val kSalt = u.slice(40, 48)
      if (!java.util.Arrays.equals(
          hash2b(pwd, vSalt, Array.empty, r), hash)) None
      else Some(aesCbcRaw(hash2b(pwd, kSalt, Array.empty, r),
        new Array[Byte](16), ue, enc = false))
    }

    /** Validate the /Perms block: AES-256-ECB under the FILE key; bytes
      * 9–11 must be 'a','d','b', bytes 0–3 the little-endian /P, byte 8
      * 'T'/'F' matching /EncryptMetadata. A mismatch means the file key
      * is wrong or the permissions block was tampered — reject either
      * way (validate, don't trust).
      */
    def checkPermsV5(fileKey: Array[Byte], perms: Array[Byte], p: Int,
        encryptMetadata: Boolean): Boolean =
      perms.length == 16 && {
        val d = aesEcbRaw(fileKey, perms, enc = false)
        d(9) == 'a'.toByte && d(10) == 'd'.toByte && d(11) == 'b'.toByte &&
        ((d(0) & 0xff) | ((d(1) & 0xff) << 8) | ((d(2) & 0xff) << 16) |
          ((d(3) & 0xff) << 24)) == p &&
        d(8) == (if (encryptMetadata) 'T' else 'F').toByte
      }

    /** Fixture-writer V5 materials (reverse of [[fileKeyV5]] /
      * [[checkPermsV5]]): deterministic salts and file key derived from
      * `tag` (the repo-wide no-RNG rule — a production writer would
      * draw them from a CSPRNG). Returns (u48, ue, o48, oe, perms,
      * fileKey).
      */
    def v5Materials(ownerPw: Array[Byte], userPw: Array[Byte], p: Int,
        encryptMetadata: Boolean, r: Int, tag: String):
        (Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
      val A = java.nio.charset.StandardCharsets.ISO_8859_1
      def det(label: String, n: Int): Array[Byte] =
        sha256(s"graft-fixture-$label:$tag".getBytes(A)).take(n)
      val fileKey = det("filekey", 32)
      val uv = det("uvsalt", 8); val uk = det("uksalt", 8)
      val ov = det("ovsalt", 8); val ok = det("oksalt", 8)
      val iv0 = new Array[Byte](16)
      val u48 = hash2b(userPw, uv, Array.empty, r) ++ uv ++ uk
      val ue = aesCbcRaw(hash2b(userPw, uk, Array.empty, r), iv0, fileKey, enc = true)
      val o48 = hash2b(ownerPw, ov, u48, r) ++ ov ++ ok
      val oe = aesCbcRaw(hash2b(ownerPw, ok, u48, r), iv0, fileKey, enc = true)
      val permsPlain =
        le32(p) ++ Array.fill(4)(0xff.toByte) ++
          Array((if (encryptMetadata) 'T' else 'F').toByte,
            'a'.toByte, 'd'.toByte, 'b'.toByte) ++ det("permtail", 4)
      val perms = aesEcbRaw(fileKey, permsPlain, enc = true)
      (u48, ue, o48, oe, perms, fileKey)
    }

    /** Algorithm 1's per-object key: MD5(fileKey ∥ obj₃LE ∥ gen₂LE
      * [∥ "sAlT" for AES]) truncated to min(n+5, 16).
      */
    def objKey(fileKey: Array[Byte], num: Int, gen: Int,
        aes: Boolean): Array[Byte] = {
      val ext = Array[Byte](
        (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte,
        (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
      val salt =
        if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte]
      md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
    }

    /** Decrypt one object's stream data. AESV2 = AES-128-CBC with the
      * IV as the first 16 ciphertext bytes and PKCS#7 padding, stripped
      * manually after a NoPadding decrypt so malformed padding rejects
      * as a PdfError, not a crypto exception class the envelope would
      * still catch but less legibly. A 32-byte `fileKey` is the /V 5
      * form (Algorithm 1.A): the file key encrypts every object
      * directly — no per-object MD5 derivation — with the same
      * IV-prefix CBC body; V ≤ 4 keys are ≤ 16 bytes, so key length
      * is an unambiguous discriminator.
      */
    def decrypt(fileKey: Array[Byte], num: Int, gen: Int, aes: Boolean,
        data: Array[Byte]): Array[Byte] = {
      if (fileKey.length == 32) aesBodyDecrypt(fileKey, data)
      else {
        val k = objKey(fileKey, num, gen, aes)
        if (!aes) rc4(k, data) else aesBodyDecrypt(k, data)
      }
    }

    private def aesBodyDecrypt(k: Array[Byte], data: Array[Byte]): Array[Byte] = {
      if (data.length < 32 || data.length % 16 != 0)
        throw new PdfError("bad AES stream length")
      val plain = aesCbcRaw(k, data.take(16),
        java.util.Arrays.copyOfRange(data, 16, data.length), enc = false)
      val pad = plain.last & 0xff
      if (pad < 1 || pad > 16 || pad > plain.length)
        throw new PdfError("bad AES padding")
      (plain.length - pad until plain.length).foreach { i =>
        if ((plain(i) & 0xff) != pad) throw new PdfError("bad AES padding")
      }
      plain.dropRight(pad)
    }

    /** Encrypt one object's stream data (fixture writer). The AES IV
      * derives deterministically from the object number so fixtures are
      * byte-stable run to run; an attacker-facing writer would use a
      * random IV, a FIXTURE must not (the repo-wide no-RNG rule).
      */
    def encrypt(fileKey: Array[Byte], num: Int, gen: Int, aes: Boolean,
        data: Array[Byte]): Array[Byte] = {
      if (fileKey.length == 32) aesBodyEncrypt(fileKey, num, gen, data)
      else {
        val k = objKey(fileKey, num, gen, aes)
        if (!aes) rc4(k, data) else aesBodyEncrypt(k, num, gen, data)
      }
    }

    private def aesBodyEncrypt(k: Array[Byte], num: Int, gen: Int,
        data: Array[Byte]): Array[Byte] = {
      val iv = md5(s"graft-fixture-iv:$num:$gen"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(data)
    }
  }

  /** Fixture-writer encryption spec: V2/R3 RC4-128 (`aes = false`),
    * V4/R4 AES-128 AESV2 (`aes = true`), or V5 AES-256 AESV3
    * (`v5 = true`; `r5 = true` selects the pre-PDF-2.0 R 5 hash, else
    * R 6); `userPw` non-empty plants a genuinely password-protected
    * document (the reader must reject it).
    */
  final case class EncSpec(ownerPw: String, userPw: String = "",
      aes: Boolean = false, v5: Boolean = false, r5: Boolean = false)

  /** Writer-side encryption materials (one per encrypted fixture);
    * oe/ue/perms are empty for the V ≤ 4 forms.
    */
  private final case class EncMat(es: EncSpec, r: Int, v: Int,
      o: Array[Byte], u: Array[Byte], oe: Array[Byte], ue: Array[Byte],
      perms: Array[Byte], p: Int, id0: Array[Byte], key: Array[Byte])

  /** Fixture-writer embedded image: an /Image XObject registered under
    * the page's /Resources as `/Im<k>`. `dct = true` stores `data` as
    * the undecoded JPEG under /Filter /DCTDecode (the real-world form);
    * `dct = false` deflates `data` as a raw /DeviceGray raster under
    * /FlateDecode — the form [[extractImages]] must SKIP.
    */
  final case class ImgSpec(w: Int, h: Int, data: Array[Byte],
      dct: Boolean = true)

  // ---------------- writer (fixtures + spec) ----------------

  /** A complete classic-xref PDF. `pageStreams`: per page, one or more
    * content streams (split mid-page to exercise the concat rule).
    * `flate` compresses every content stream; `indirectLength` stores
    * each /Length as a separate object; `nestedPages` inserts an inner
    * Pages node around the first page (tree walk exercise).
    */
  def makePdf(pageStreams: Seq[Seq[Array[Byte]]], flate: Boolean = false,
      indirectLength: Boolean = false, nestedPages: Boolean = false,
      fonts: Seq[FontSpec] = Nil,
      contentFilter: Seq[String] = Nil,
      encrypt: Option[EncSpec] = None,
      pageImages: Seq[Seq[ImgSpec]] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit =
      out.write(t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.Map[Int, Int]()
    var nextId = 1
    def alloc(): Int = { val id = nextId; nextId += 1; id }

    val catalogId = alloc() // 1
    val pagesId = alloc() // 2
    val fontId = alloc() // 3
    val innerPagesId = if (nestedPages && pageStreams.size > 1) alloc() else -1
    val pageIds = pageStreams.map(_ => alloc())
    val contentIds = pageStreams.map(ss => ss.map(_ => alloc()))
    val lengthIds = if (indirectLength) contentIds.map(_.map(_ => alloc())) else Nil
    // extra fixture fonts: one font object each, plus a /ToUnicode CMap
    // stream object where the spec carries one
    val extraFontIds = fonts.map(_ => alloc())
    val cmapIds = fonts.map {
      case _: DiffFont => -1
      case _ => alloc()
    }
    val encryptId = if (encrypt.isDefined) alloc() else -1
    val imgIds: Seq[Seq[Int]] =
      pageStreams.indices.map(p =>
        pageImages.lift(p).getOrElse(Nil).map(_ => alloc()))

    // standard-security-handler materials (reverse direction of the
    // reader's setupEncryption; same PdfCrypt algorithms)
    val A85 = java.nio.charset.StandardCharsets.ISO_8859_1
    val encMat: Option[EncMat] =
      encrypt.map { es =>
        val p = -44
        val id0 = PdfCrypt.md5(
          s"graft-fixture-id:${es.ownerPw}:${es.userPw}".getBytes(A85))
        if (es.v5) {
          val r = if (es.r5) 5 else 6
          val (u, ue, o, oe, perms, key) = PdfCrypt.v5Materials(
            es.ownerPw.getBytes(A85), es.userPw.getBytes(A85), p,
            encryptMetadata = true, r,
            tag = s"${es.ownerPw}:${es.userPw}:$r")
          EncMat(es, r, 5, o, u, oe, ue, perms, p, id0, key)
        } else {
          val r = if (es.aes) 4 else 3
          val v = if (es.aes) 4 else 2
          val o = PdfCrypt.ownerValue(es.ownerPw.getBytes(A85),
            es.userPw.getBytes(A85), r, 16)
          val key = PdfCrypt.fileKey(es.userPw.getBytes(A85), o, p, id0, r, 16,
            encryptMetadata = true)
          val u = PdfCrypt.userValue(key, id0, r)
          EncMat(es, r, v, o, u, Array.empty, Array.empty, Array.empty, p, id0, key)
        }
      }
    def hexS(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
    def encStream(id: Int, data: Array[Byte]): Array[Byte] = encMat match {
      case Some(m) => PdfCrypt.encrypt(m.key, id, 0, m.es.aes, data)
      case None => data
    }

    def beginObj(id: Int): Unit = { offsets(id) = out.size(); w(s"$id 0 obj\n") }
    def endObj(): Unit = w("endobj\n")

    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(catalogId)
    w(s"<< /Type /Catalog /Pages $pagesId 0 R >>\n"); endObj()

    val kidRefs =
      if (innerPagesId > 0)
        s"$innerPagesId 0 R " + pageIds.tail.map(id => s"$id 0 R ").mkString
      else pageIds.map(id => s"$id 0 R ").mkString
    beginObj(pagesId)
    val topCount = pageStreams.size
    w(s"<< /Type /Pages /Kids [ $kidRefs] /Count $topCount >>\n"); endObj()
    if (innerPagesId > 0) {
      beginObj(innerPagesId)
      w(s"<< /Type /Pages /Parent $pagesId 0 R /Kids [ ${pageIds.head} 0 R ] /Count 1 >>\n")
      endObj()
    }
    beginObj(fontId)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"); endObj()
    fonts.indices.foreach { fi =>
      fonts(fi) match {
        case DiffFont(_, differences) =>
          beginObj(extraFontIds(fi))
          w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
            s"/Encoding << /Type /Encoding /Differences [ $differences ] >> >>\n")
          endObj()
        case ToUniFont(_, cmap, cid) =>
          beginObj(extraFontIds(fi))
          if (cid)
            w("<< /Type /Font /Subtype /Type0 /BaseFont /Fixture " +
              "/Encoding /Identity-H /DescendantFonts [ << /Type /Font " +
              "/Subtype /CIDFontType2 /BaseFont /Fixture /CIDSystemInfo " +
              "<< /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >> ] " +
              s"/ToUnicode ${cmapIds(fi)} 0 R >>\n")
          else
            w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
              s"/ToUnicode ${cmapIds(fi)} 0 R >>\n")
          endObj()
          val cmapBytes = encStream(cmapIds(fi),
            cmap.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
          beginObj(cmapIds(fi))
          w(s"<< /Length ${cmapBytes.length} >>\nstream\n")
          out.write(cmapBytes)
          w("\nendstream\n")
          endObj()
      }
    }
    val fontRes = s"/F1 $fontId 0 R " +
      fonts.indices.map(fi => s"/${fonts(fi).name} ${extraFontIds(fi)} 0 R ").mkString

    pageStreams.indices.foreach { p =>
      val parent = if (p == 0 && innerPagesId > 0) innerPagesId else pagesId
      val contents =
        if (contentIds(p).size == 1) s"${contentIds(p).head} 0 R"
        else "[ " + contentIds(p).map(id => s"$id 0 R ").mkString + "]"
      val xobjRes =
        if (imgIds(p).isEmpty) ""
        else " /XObject << " + imgIds(p).zipWithIndex
          .map { case (id, k) => s"/Im$k $id 0 R " }.mkString + ">>"
      beginObj(pageIds(p))
      w(s"<< /Type /Page /Parent $parent 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << $fontRes>>$xobjRes >> /Contents $contents >>\n")
      endObj()
      pageImages.lift(p).getOrElse(Nil).zip(imgIds(p)).foreach {
        case (im, id) =>
          val body = encStream(id,
            if (im.dct) im.data else deflate(im.data))
          val filter = if (im.dct) "/DCTDecode" else "/FlateDecode"
          beginObj(id)
          w(s"<< /Type /XObject /Subtype /Image /Width ${im.w} " +
            s"/Height ${im.h} /ColorSpace /DeviceGray /BitsPerComponent 8 " +
            s"/Filter $filter /Length ${body.length} >>\nstream\n")
          out.write(body)
          w("\nendstream\n")
          endObj()
      }
      pageStreams(p).indices.foreach { k =>
        val data0 = pageStreams(p)(k)
        // filters listed in DECODE order (the /Filter array form), so the
        // writer applies their encode sides right-to-left
        val filters: Seq[String] =
          if (contentFilter.nonEmpty) contentFilter
          else if (flate) Seq("FlateDecode") else Nil
        // encryption is the OUTERMOST layer: filters encode first, then
        // the whole stream body encrypts; /Length counts encrypted bytes
        val data = encStream(contentIds(p)(k),
          filters.foldRight(data0)((f, acc) => encodeFilter(f, acc)))
        val lenPart =
          if (indirectLength) s"/Length ${lengthIds(p)(k)} 0 R"
          else s"/Length ${data.length}"
        val filterPart = filters match {
          case Seq() => ""
          case Seq(one) => s" /Filter /$one"
          case many => many.mkString(" /Filter [ /", " /", " ]")
        }
        beginObj(contentIds(p)(k))
        w(s"<< $lenPart$filterPart >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
        endObj()
        if (indirectLength) {
          beginObj(lengthIds(p)(k))
          w(s"${data.length}\n"); endObj()
        }
      }
    }

    encMat.foreach { m =>
      // the /Encrypt dict itself is never encrypted (and /O /U are hex
      // strings so no literal-string escaping questions arise)
      beginObj(encryptId)
      if (m.v == 5)
        w(s"<< /Filter /Standard /V 5 /R ${m.r} /Length 256 /P ${m.p} " +
          s"/O <${hexS(m.o)}> /U <${hexS(m.u)}> /OE <${hexS(m.oe)}> " +
          s"/UE <${hexS(m.ue)}> /Perms <${hexS(m.perms)}> " +
          "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
          "/StmF /StdCF /StrF /StdCF >>\n")
      else {
        val cf =
          if (m.es.aes)
            " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
              "/StmF /StdCF /StrF /StdCF"
          else ""
        w(s"<< /Filter /Standard /V ${m.v} /R ${m.r} /Length 128 /P ${m.p} " +
          s"/O <${hexS(m.o)}> /U <${hexS(m.u)}>$cf >>\n")
      }
      endObj()
    }

    val xrefOff = out.size()
    val maxId = nextId
    w(s"xref\n0 $maxId\n")
    w("0000000000 65535 f \n")
    (1 until maxId).foreach { id =>
      w(f"${offsets(id)}%010d 00000 n \n")
    }
    val encTrailer = encMat match {
      case Some(m) =>
        s" /Encrypt $encryptId 0 R /ID [ <${hexS(m.id0)}> <${hexS(m.id0)}> ]"
      case None => ""
    }
    w(s"trailer\n<< /Size $maxId /Root $catalogId 0 R$encTrailer >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Fixture-writer font resource spec (r10, non-latin envelope):
    * [[DiffFont]] = a simple font re-encoded via /Encoding
    * /Differences glyph names; [[ToUniFont]] = a font carrying a
    * /ToUnicode CMap stream — `cid = true` writes the Identity-H
    * composite form (2-byte codes), `false` a 1-byte simple font.
    */
  sealed trait FontSpec { def name: String }
  final case class DiffFont(name: String, differences: String) extends FontSpec
  final case class ToUniFont(name: String, cmap: String, cid: Boolean) extends FontSpec

  /** Escape a string for a PDF literal string token. */
  def esc(t: String): String =
    t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val bo = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
    d.end()
    bo.toByteArray
  }

  /** Fixture-side LZW encoder (TIFF variant, EarlyChange = 1): leading
    * ClearTable, MSB-first variable-width codes, trailing EOD. The
    * width grows when the encoder's post-add next-code reaches
    * 1 << width — the natural rule whose one-entry decoder lag is
    * exactly what EarlyChange compensates (see [[lzwDecode]]). Bounded
    * fixture inputs never fill the table; a require guards that
    * envelope rather than implementing mid-stream re-clears.
    */
  private[graft] def lzwEncode(data: Array[Byte],
      earlyChange: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 64)
    var acc = 0L
    var bits = 0
    var width = 9
    def emit(code: Int): Unit = {
      acc = (acc << width) | code.toLong
      bits += width
      while (bits >= 8) { out.write(((acc >>> (bits - 8)) & 0xff).toInt); bits -= 8 }
    }
    emit(256)
    if (data.nonEmpty) {
      val dict = scala.collection.mutable.Map.empty[(Int, Int), Int]
      var next = 258
      var w = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val c = data(i) & 0xff
        dict.get((w, c)) match {
          case Some(code) => w = code
          case None =>
            emit(w)
            dict((w, c)) = next; next += 1
            require(next < 4096, "fixture LZW input too large (table full)")
            // decoder lags one table entry at read time, so its
            // EarlyChange=1 growth at (1<<w)-1 pairs with this natural
            // rule; EarlyChange=0 pairs with growth one entry later
            if (next >= (1 << width) + (if (earlyChange) 0 else 1)
                && width < 12) width += 1
            w = c
        }
        i += 1
      }
      emit(w)
    }
    emit(257)
    if (bits > 0) out.write(((acc << (8 - bits)) & 0xff).toInt)
    out.toByteArray
  }

  /** Fixture-side ASCIIHex encoder. */
  private[graft] def asciiHexEncode(data: Array[Byte]): Array[Byte] =
    (data.map(b => f"${b & 0xff}%02X").mkString + ">")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Fixture-side ASCII85 encoder: 4-byte groups base 85, `z` for
    * all-zero full groups, n+1 chars for a trailing n-byte partial,
    * `~>` EOD.
    */
  private[graft] def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 5 / 4 + 4)
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) {
        v = (v << 8) | (if (j < n) data(i + j) & 0xffL else 0L)
        j += 1
      }
      if (v == 0L && n == 4) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var k = 4
        while (k >= 0) { cs(k) = ('!' + (v % 85).toInt).toChar; v /= 85; k -= 1 }
        var m = 0
        while (m < n + 1) { sb.append(cs(m)); m += 1 }
      }
      i += n
    }
    sb.append("~>")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Apply one filter's ENCODE side (fixture writer). */
  private def encodeFilter(name: String, data: Array[Byte]): Array[Byte] =
    name match {
      case "FlateDecode" => deflate(data)
      case "LZWDecode" => lzwEncode(data)
      case "ASCIIHexDecode" => asciiHexEncode(data)
      case "ASCII85Decode" => ascii85Encode(data)
      case other => throw new IllegalArgumentException(s"no encoder for $other")
    }

  /** PNG Up (predictor 12) row encoding — the standard pre-compression
    * transform real writers apply to xref-stream data.
    */
  private def pngPredictUp(data: Array[Byte], rowLen: Int): Array[Byte] = {
    require(data.length % rowLen == 0)
    val rows = data.length / rowLen
    val out = new Array[Byte]((rowLen + 1) * rows)
    (0 until rows).foreach { r =>
      out(r * (rowLen + 1)) = 2 // Up
      (0 until rowLen).foreach { i =>
        val cur = data(r * rowLen + i) & 0xff
        val up = if (r > 0) data((r - 1) * rowLen + i) & 0xff else 0
        out(r * (rowLen + 1) + 1 + i) = ((cur - up) & 0xff).toByte
      }
    }
    out
  }

  /** A complete MODERN (PDF 1.5) file: every non-stream object lives
    * compressed inside an /ObjStm object stream, the cross-reference is
    * a binary /XRef STREAM (W = [1 3 1], type-2 entries pointing into
    * the ObjStm), optionally PNG-Up-predicted — the layout current PDF
    * producers actually emit.
    */
  def makePdf15(pageStreams: Seq[Seq[Array[Byte]]], predictor: Boolean = false,
      flateContent: Boolean = true): Array[Byte] = {
    val P = pageStreams.size
    val pageIds = (0 until P).map(4 + _)
    var next = 4 + P
    val contentIds = pageStreams.map(ss => ss.map { _ =>
      val id = next; next += 1; id
    })
    val objStmId = next
    val xrefId = next + 1
    next += 2

    val members: Seq[(Int, String)] = (Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> ("<< /Type /Pages /Kids [ " +
        pageIds.map(id => s"$id 0 R ").mkString + s"] /Count $P >>"),
      3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
      ++ pageIds.zipWithIndex.map { case (id, p) =>
        val contents =
          if (contentIds(p).size == 1) s"${contentIds(p).head} 0 R"
          else "[ " + contentIds(p).map(c => s"$c 0 R ").mkString + "]"
        id -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contents >>")
      })
    val bodies = members.map(_._2 + "\n")
    val memberOffs = bodies.scanLeft(0)(_ + _.length).init
    val header = members.map(_._1).zip(memberOffs)
      .map { case (id, o) => s"$id $o " }.mkString
    val objStmPlain = (header + bodies.mkString)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val objStmData = deflate(objStmPlain)

    val out = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit =
      out.write(t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.Map[Int, Int]()
    w("%PDF-1.5\n%âãÏÓ\n")
    pageStreams.indices.foreach { p =>
      pageStreams(p).indices.foreach { k =>
        val data0 = pageStreams(p)(k)
        val data = if (flateContent) deflate(data0) else data0
        val filter = if (flateContent) " /Filter /FlateDecode" else ""
        offsets(contentIds(p)(k)) = out.size()
        w(s"${contentIds(p)(k)} 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
        out.write(data)
        w("\nendstream\nendobj\n")
      }
    }
    offsets(objStmId) = out.size()
    w(s"$objStmId 0 obj\n<< /Type /ObjStm /N ${members.size} " +
      s"/First ${header.length} /Length ${objStmData.length} /Filter /FlateDecode >>\nstream\n")
    out.write(objStmData)
    w("\nendstream\nendobj\n")

    val xrefOff = out.size()
    offsets(xrefId) = xrefOff
    // entries: one row per object 0..next-1, W = [1 3 1]
    val rowLen = 5
    val entries = new Array[Byte](next * rowLen)
    def put(num: Int, tpe: Int, f2: Int, f3: Int): Unit = {
      val o = num * rowLen
      entries(o) = tpe.toByte
      entries(o + 1) = ((f2 >> 16) & 0xff).toByte
      entries(o + 2) = ((f2 >> 8) & 0xff).toByte
      entries(o + 3) = (f2 & 0xff).toByte
      entries(o + 4) = f3.toByte
    }
    put(0, 0, 0, 255) // free head
    members.map(_._1).zipWithIndex.foreach { case (id, idx) =>
      put(id, 2, objStmId, idx)
    }
    contentIds.flatten.foreach(id => put(id, 1, offsets(id), 0))
    put(objStmId, 1, offsets(objStmId), 0)
    put(xrefId, 1, xrefOff, 0)
    val (xrefData, parms) =
      if (predictor)
        (deflate(pngPredictUp(entries, rowLen)),
          s" /DecodeParms << /Predictor 12 /Columns $rowLen >>")
      else (deflate(entries), "")
    w(s"$xrefId 0 obj\n<< /Type /XRef /Size $next /W [1 3 1] /Root 1 0 R " +
      s"/Length ${xrefData.length} /Filter /FlateDecode$parms >>\nstream\n")
    out.write(xrefData)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
