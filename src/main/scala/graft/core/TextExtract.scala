package graft.core

/** Deterministic HTML → text extraction.
  *
  * The build's per-row invariant is *byte-identical extracted text per url*
  * (BASELINE.json input_hint). The reference repo defines no HTML rule (it
  * is a spectroscopy pipeline), so per SURVEY.md §7.5.5 the rule is defined
  * HERE, once, with pinned whitespace semantics, and frozen by byte-level
  * fixtures — the analog of the reference's float32 round-trip quirk
  * (reference: scripts/synth_night.py:92) where parity lives at the byte
  * level.
  *
  * THE RULE (normative):
  *  1. Decode bytes as UTF-8 (malformed sequences → U+FFFD).
  *  2. Drop <script>…</script>, <style>…</style>, and <!-- … --> comments
  *     entirely (case-insensitive tag names).
  *  3. A closing or self-closing block tag (p, div, br, li, tr, h1–h6,
  *     table, ul, ol, section, article, header, footer, title) emits '\n';
  *     every other tag emits nothing.
  *  4. Decode exactly these entities: &amp; &lt; &gt; &quot; &apos; &#39;
  *     &nbsp; (→ regular space) and numeric &#NNN; / &#xHH; (code points
  *     < 0x110000). Unknown entities pass through literally.
  *  5. Whitespace: runs of spaces/tabs collapse to one space; spaces around
  *     newlines are removed; runs of >2 newlines collapse to exactly 2;
  *     leading/trailing whitespace of the whole document is trimmed.
  */
object TextExtract {
  private val BlockTags = Set(
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "table", "ul", "ol", "section", "article", "header", "footer", "title")

  def extract(html: Array[Byte]): String =
    extractString(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def extractString(html: String): String = {
    val n = html.length
    // lowercased copy computed once — used only for tag-name search; the
    // emitted text always comes from the original string
    lazy val lowerHtml = html.toLowerCase(java.util.Locale.ROOT)
    val out = new java.lang.StringBuilder(n / 2)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // parse tag name
          var j = i + 1
          var closing = false
          if (j < n && html.charAt(j) == '/') { closing = true; j += 1 }
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          val tagEnd = html.indexOf('>', j)
          if (tagEnd < 0) { i = n } // unterminated tag: drop rest
          else if (!closing && (name == "script" || name == "style")) {
            val close = lowerHtml.indexOf(s"</$name", tagEnd)
            if (close < 0) i = n
            else {
              val ce = html.indexOf('>', close)
              i = if (ce < 0) n else ce + 1
            }
          } else {
            val selfClose = tagEnd > i && html.charAt(tagEnd - 1) == '/'
            if (BlockTags.contains(name) && (closing || selfClose || name == "br"))
              out.append('\n')
            i = tagEnd + 1
          }
        }
      } else if (c == '&') {
        val (repl, skip) = decodeEntity(html, i)
        out.append(repl)
        i += skip
      } else {
        out.append(c)
        i += 1
      }
    }
    normalizeWhitespace(out.toString)
  }

  /** Returns (replacement, chars consumed). */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val n = s.length
    def lit = ("&", 1)
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return lit
    val body = s.substring(i + 1, semi)
    val repl: String = body match {
      case "amp"  => "&"
      case "lt"   => "<"
      case "gt"   => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case b if b.startsWith("#x") || b.startsWith("#X") =>
        try {
          val cp = Integer.parseInt(b.substring(2), 16)
          if (cp > 0 && cp < 0x110000) new String(Character.toChars(cp)) else null
        } catch { case _: Exception => null }
      case b if b.startsWith("#") =>
        try {
          val cp = Integer.parseInt(b.substring(1))
          if (cp > 0 && cp < 0x110000) new String(Character.toChars(cp)) else null
        } catch { case _: Exception => null }
      case _ => null
    }
    if (repl == null) lit else (repl, semi - i + 1)
  }

  /** Pinned whitespace normalization (rule step 5). */
  def normalizeWhitespace(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var pendingNewlines = 0
    var emittedAny = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\n' || c == '\r') {
        if (!(c == '\n' && i > 0 && s.charAt(i - 1) == '\r')) pendingNewlines += 1
        pendingSpace = false
      } else if (c == ' ' || c == '\t' || c == '\u000B' || c == '\f') {
        pendingSpace = true
      } else {
        if (emittedAny) {
          if (pendingNewlines > 0) out.append(if (pendingNewlines == 1) "\n" else "\n\n")
          else if (pendingSpace) out.append(' ')
        }
        pendingNewlines = 0; pendingSpace = false
        out.append(c)
        emittedAny = true
      }
      i += 1
    }
    out.toString
  }
}
