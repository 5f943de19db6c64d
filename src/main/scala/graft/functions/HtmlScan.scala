package graft.functions

/** The ONE char-level tag/attribute scanning core shared by every HTML
  * walker in the engine — `html_text` ([[HtmlStrip]]), `html_blocks`
  * ([[HtmlBlocks]]), `html_links`/`html_anchors` ([[HtmlLinks]]),
  * `html_meta` ([[HtmlMeta]]) and the byte-window charset prescan
  * ([[MetaCharset]]). Until r10 these five carried copy-adapted clones
  * of the same four routines; behavioral drift between them was only
  * pinned by a parity fuzz. Now the discipline is structural: one
  * definition of
  *
  *  - the HTML5 raw-text end scan (`</name` + `>`/`/`/ws/EOF),
  *  - the RCDATA content-end scan (same boundary, content-exclusive),
  *  - the quote-aware tag skip (a `>` inside a quoted attribute value
  *    does not end the tag),
  *  - the quote-aware attribute walk (name case-folded, `=`-optional
  *    values, double/single/unquoted forms, RAW values — entity
  *    decoding is each caller's policy, e.g. the prescan deliberately
  *    does NOT decode).
  *
  * What stays per-caller is exactly what DIFFERS intentionally between
  * the walkers: tag-open dispatch (the prescan's comment/bogus-comment
  * rules follow WHATWG §13.2.3.2, the body walkers follow the tree-
  * construction view), entity policy, window aborts, and what each
  * walker does with the scanned tag.
  *
  * Positions pack as `(pos << 1) | closedBit` so the walk stays
  * allocation-free; callers unpack with [[pos]] / [[closed]].
  */
object HtmlScan {

  @inline def pos(packed: Long): Int = (packed >>> 1).toInt
  @inline def closed(packed: Long): Boolean = (packed & 1L) == 1L
  @inline private def pack(p: Int, c: Boolean): Long =
    (p.toLong << 1) | (if (c) 1L else 0L)

  /** Raw-text end per HTML5: first `</name` (case-insensitive) followed
    * by `>`, `/`, whitespace, or EOF; returns the index AFTER the
    * closing `>` (or `s.length` when the raw text runs to EOF).
    */
  def rawTextEnd(s: String, name: String, from: Int): Int = {
    val n = s.length
    var k = from
    while (k < n) {
      val idx = s.indexOf("</", k)
      if (idx < 0) return n
      val after = idx + 2 + name.length
      if (s.regionMatches(true, idx + 2, name, 0, name.length) &&
          (after >= n || {
            val ac = s.charAt(after)
            ac == '>' || ac == '/' || Character.isWhitespace(ac)
          })) {
        val e = s.indexOf('>', idx + 2)
        return if (e < 0) n else e + 1
      }
      k = idx + 2
    }
    n
  }

  /** RCDATA run end: index of the `</name` boundary itself (content
    * excludes it), or `s.length`.
    */
  def rcdataContentEnd(s: String, name: String, from: Int): Int = {
    val n = s.length
    var k = from
    while (k < n) {
      val idx = s.indexOf("</", k)
      if (idx < 0) return n
      val after = idx + 2 + name.length
      if (s.regionMatches(true, idx + 2, name, 0, name.length) &&
          (after >= n || {
            val ac = s.charAt(after)
            ac == '>' || ac == '/' || Character.isWhitespace(ac)
          })) return idx
      k = idx + 2
    }
    n
  }

  /** Skip to the tag's real end from just past the tag name, honoring
    * quoted attribute values. Packed (endPos, closed); an EOF-in-tag
    * returns closed = false with pos = `s.length`.
    */
  def skipTag(s: String, from: Int): Long = {
    val n = s.length
    var j = from
    var q: Char = 0
    var cl = false
    while (j < n && !cl) {
      val ch = s.charAt(j)
      if (q != 0) { if (ch == q) q = 0 }
      else if (ch == '"' || ch == '\'') q = ch
      else if (ch == '>') cl = true
      j += 1
    }
    pack(j, cl)
  }

  /** Quote-aware attribute walk from just past the tag name: for every
    * attribute, calls `sink(lowercasedName, rawValue)` — value is ""
    * for a valueless attribute, and is NOT entity-decoded (caller
    * policy). Duplicate handling (first-wins per HTML5) is the caller's
    * via its sink. Packed (endPos, closed); an unterminated tag or an
    * unterminated quoted value at EOF returns closed = false (the sink
    * may have seen a partial last value — callers drop unclosed tags).
    */
  def attrWalk(s: String, from: Int, sink: (String, String) => Unit): Long = {
    val n = s.length
    var j = from
    var cl = false
    while (j < n && !cl) {
      while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
      if (j < n && s.charAt(j) == '>') { cl = true; j += 1 }
      else if (j < n && s.charAt(j) == '/') j += 1
      else if (j < n) {
        val an = j
        while (j < n && !Character.isWhitespace(s.charAt(j)) &&
            s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
        val attr = s.substring(an, j).toLowerCase(java.util.Locale.ROOT)
        while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
        var value = ""
        if (j < n && s.charAt(j) == '=') {
          j += 1
          while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
          if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j)
            j += 1
            val vs = j
            while (j < n && s.charAt(j) != q) j += 1
            value = s.substring(vs, j)
            if (j < n) j += 1 // closing quote (EOF inside the value
            // leaves the tag unclosed — callers drop the fragment)
          } else {
            val vs = j
            while (j < n && !Character.isWhitespace(s.charAt(j)) &&
                s.charAt(j) != '>') j += 1
            value = s.substring(vs, j)
          }
        }
        sink(attr, value)
      }
    }
    pack(j, cl)
  }
}
