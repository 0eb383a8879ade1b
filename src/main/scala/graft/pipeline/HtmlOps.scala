package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** HTML boilerplate extraction — the step upstream of every text-quality
  * operator on real crawl data: strip markup, split the page into text
  * blocks, and keep only CONTENT blocks, dropping navigation chrome,
  * headers/footers/sidebars, and link lists.
  *
  * The block classifier is the public Boilerpipe/jusText family of
  * per-document heuristics (Kohlschütter et al., WSDM 2010):
  *   1. structural context — blocks inside `nav`/`header`/`footer`/`aside`
  *      are chrome by construction;
  *   2. link density — a block whose words are mostly anchor text is a
  *      menu, not prose (threshold 1/3);
  *   3. length — sub-2-word fragments (icons, separators) are noise.
  * Site-wide repeated taglines that pass all three are the CROSS-document
  * case, covered by the span-dedup operator (q56), not this per-doc pass.
  *
  * Everything is a per-payload pure-Scala kernel with zero dependencies —
  * it runs inside `mapPartitions` over the page column exactly like the
  * media codecs ([[ImageOps]]): no shuffle, no UDF registry, payloads
  * never leave the executor that read them. Deterministic by construction
  * (no regex backtracking surprises: a single-pass character state
  * machine).
  */
object HtmlOps {

  /** One text block plus the classifier features it was judged on. */
  final case class Block(text: String, words: Int, linkWords: Int, inChrome: Boolean) {
    def isContent: Boolean =
      !inChrome && words >= 2 && 3 * linkWords <= words
  }

  // Tags whose raw content is never text (parsed until the matching close).
  private val RawTextTags = Set("script", "style", "title")
  // Tags that open a chrome (boilerplate-by-structure) region.
  private val ChromeTags = Set("nav", "header", "footer", "aside")
  // Tags that terminate the current text block.
  private val BlockTags = Set("p", "div", "li", "ul", "ol", "h1", "h2", "h3",
    "h4", "h5", "h6", "br", "tr", "td", "th", "table", "section", "article",
    "main", "blockquote", "pre", "body", "html") ++ ChromeTags

  private def decodeEntity(s: String): String = s match {
    case "amp" => "&"
    case "lt" => "<"
    case "gt" => ">"
    case "quot" => "\""
    case "nbsp" => " "
    case e if e.startsWith("#") =>
      // decimal or hex (&#x...;) reference; supplementary-plane codepoints
      // (emoji, &#128512;) need toChars — a bare .toChar would keep only
      // the low 16 bits and silently corrupt the text. Out-of-range or
      // malformed references pass through verbatim, never wrap.
      val hex = e.length > 1 && (e.charAt(1) == 'x' || e.charAt(1) == 'X')
      val digits = if (hex) e.drop(2) else e.drop(1)
      try {
        val cp = Integer.parseInt(digits, if (hex) 16 else 10)
        // surrogate code points (U+D800-U+DFFF) pass isValidCodePoint but
        // toChars would emit an unpaired surrogate — invalid UTF-16 that
        // UTF8String mangles to U+FFFD; verbatim pass-through instead
        if (Character.isValidCodePoint(cp) && !(cp >= 0xD800 && cp <= 0xDFFF))
          new String(Character.toChars(cp))
        else "&" + e + ";"
      } catch { case _: Throwable => "&" + e + ";" }
    case e => "&" + e + ";" // unknown entities pass through verbatim
  }

  /** Locale-independent case-insensitive indexOf (ASCII tag names): a
    * forward regionMatches scan from `from`, so each raw-text skip costs
    * O(skipped region), not an O(document) whole-page toLowerCase per tag
    * (quadratic on script-heavy crawl pages, and default-locale
    * toLowerCase breaks tag matching on e.g. a Turkish-locale JVM). */
  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val nl = needle.length
    var j = math.max(from, 0)
    val last = hay.length - nl
    while (j <= last) {
      if (hay.regionMatches(true, j, needle, 0, nl)) return j
      j += 1
    }
    -1
  }

  /** Single-pass parse: markup → classified text blocks. Malformed input
    * (unclosed tags, stray `<`) degrades to treating the tail as text —
    * never throws (the media-codec skip contract). */
  def blocks(html: String): Vector[Block] = {
    val out = ArrayBuffer.empty[Block]
    val text = new StringBuilder
    var words = 0
    var linkWords = 0
    var inWord = false
    var chromeDepth = 0
    var linkDepth = 0
    var i = 0
    val n = html.length

    def endWord(): Unit = if (inWord) {
      words += 1
      if (linkDepth > 0) linkWords += 1
      inWord = false
    }
    // end of the tag whose '<' is at `from - 1`: first '>' OUTSIDE quoted
    // attribute values (href="/x?a>b" is legal and common in real crawls)
    def tagEnd(from: Int): Int = {
      var j = from
      var quote: Char = 0
      while (j < n) {
        val ch = html.charAt(j)
        if (quote != 0) { if (ch == quote) quote = 0 }
        else if (ch == '"' || ch == '\'') quote = ch
        else if (ch == '>') return j
        j += 1
      }
      -1
    }
    def flush(chrome: Boolean): Unit = {
      endWord()
      val t = text.toString.trim.replaceAll("\\s+", " ")
      if (t.nonEmpty) out += Block(t, words, linkWords, chrome)
      text.clear(); words = 0; linkWords = 0
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) { // comment
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = tagEnd(i + 1)
          if (close < 0) { text.append(c); inWord = true; i += 1 } // stray '<'
          else {
            val body = html.substring(i + 1, close)
            val isEnd = body.startsWith("/")
            val name = body.dropWhile(_ == '/').takeWhile(ch => ch.isLetterOrDigit)
              .toLowerCase(java.util.Locale.ROOT)
            if (!isEnd && RawTextTags.contains(name)) {
              // swallow raw content up to the matching close tag
              val endTag = "</" + name
              val stop = indexOfIgnoreCase(html, endTag, close + 1)
              if (stop < 0) i = n
              else i = math.max(close + 1, html.indexOf('>', stop) + 1)
            } else {
              if (BlockTags.contains(name)) flush(chromeDepth > 0)
              if (ChromeTags.contains(name)) {
                if (isEnd) chromeDepth = math.max(0, chromeDepth - 1)
                else chromeDepth += 1
              }
              if (name == "a") {
                endWord()
                if (isEnd) linkDepth = math.max(0, linkDepth - 1) else linkDepth += 1
              }
              i = close + 1
            }
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          val dec = decodeEntity(html.substring(i + 1, semi))
          if (dec == " ") endWord() else inWord = true
          text.append(dec)
          i = semi + 1
        } else { text.append(c); inWord = true; i += 1 }
      } else {
        if (c.isWhitespace) endWord() else inWord = true
        text.append(c)
        i += 1
      }
    }
    flush(chromeDepth > 0)
    out.toVector
  }

  /** Content blocks only, in document order. */
  def contentBlocks(html: String): Vector[String] =
    blocks(html).filter(_.isContent).map(_.text)

  /** Deterministic crawl-page FIXTURE wrapping `text` in realistic chrome:
    * head scripts/styles, a masthead, a nav link list, the body split into
    * paragraphs, a link-dense related-articles div (chrome by link density,
    * not by tag), an aside and a footer with entity escapes. The body
    * paragraphs partition `text` on single spaces, so joining the
    * extracted content blocks with one space reconstructs `text`
    * byte-exactly — the q95 gate. */
  def syntheticPage(id: Long, text: String): String = {
    val site = id % 7
    val toks = text.split(' ')
    val cut1 = toks.length / 3
    val cut2 = 2 * toks.length / 3
    val paras = Seq(toks.slice(0, math.max(cut1, 1)),
      toks.slice(math.max(cut1, 1), math.max(cut2, 1)),
      toks.slice(math.max(cut2, 1), toks.length))
      .filter(_.nonEmpty).map(_.mkString(" "))
    val sb = new StringBuilder
    sb.append("<html><head><title>Doc ").append(id)
      .append("</title><style>p{margin:0} .m>a{color:#00f}</style>")
      .append("<script>var trk=").append(id).append("; if(trk<0){trk=0}</script></head>\n")
    sb.append("<body>\n<header><h1>Site ").append(site)
      .append("</h1><p>The number one portal for everything site ").append(site)
      .append("</p></header>\n")
    sb.append("<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/news\">News</a></li>")
      .append("<li><a href=\"/about\">About us</a></li></ul></nav>\n")
    sb.append("<div class=\"content\">\n")
    paras.foreach(p => sb.append("<p>").append(p).append("</p>\n"))
    sb.append("</div>\n")
    // link-dense but OUTSIDE any chrome tag: only the density rule catches it
    sb.append("<div class=\"m\"><a href=\"/r/").append(id % 11)
      .append("\">Related story ").append(id % 11)
      .append("</a> <a href=\"/r/").append(id % 13).append("\">Also read ")
      .append(id % 13).append("</a></div>\n")
    sb.append("<aside><p>Trending on site ").append(site)
      .append(" right now</p></aside>\n")
    sb.append("<footer><p>Copyright &amp; database rights site ").append(site)
      .append(" &#169; 2026 &#8212; <a href=\"/terms\">Terms</a> ")
      .append("<a href=\"/privacy\">Privacy</a></p></footer>\n")
    sb.append("</body></html>")
    sb.toString
  }
}
