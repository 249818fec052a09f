package graft.functions

import java.util.Locale
import scala.collection.mutable.ArrayBuffer

/** HTML link / text / title extraction over real content (X1 + X5).
  *
  * Re-expresses the reference's extraction multimethods
  * (`/root/reference/src/clj/ramper/util/extraction.clj:3-58` — html→links
  * dispatch at :19-25; jericho engine `util/extraction/jericho.clj:33-37`,
  * jsoup engine `util/extraction/jsoup.clj:28-31`) as a dependency-free
  * single-pass state machine (no jsoup/jericho offline): `<a href>` values
  * with `rel=nofollow` anchors skipped, `<base href>` honored, text with
  * script/style/comment content elided and entities decoded, and the
  * `<title>` element.
  *
  * Pure Scala (no Spark types) so it is property-testable and usable both as
  * a UDF and driver-side; the crawl loop consumes it behind the same column
  * contract as the synthetic extractor (see plans.LinkExtractor).
  */
object Html {

  /** One parsed tag occurrence: name (lowercase), attributes (lowercase
    * keys), and the content span that follows it. */
  private final case class Tag(name: String, attrs: Map[String, String],
                               end: Int, closing: Boolean)

  private def isNameChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '-' || c == ':'

  /** Parse the tag starting at `<` position i; returns None for comments /
    * doctype / CDATA (caller skips them via skipSpecial). */
  private def parseTag(s: String, start: Int): Option[Tag] = {
    var i = start + 1
    if (i >= s.length) return None
    val closing = s.charAt(i) == '/'
    if (closing) i += 1
    val n0 = i
    while (i < s.length && isNameChar(s.charAt(i))) i += 1
    if (i == n0) return None
    val name = s.substring(n0, i).toLowerCase(Locale.ROOT)
    val attrs = Map.newBuilder[String, String]
    var done = false
    while (!done && i < s.length) {
      val c = s.charAt(i)
      if (c == '>') { done = true; i += 1 }
      else if (c.isWhitespace || c == '/') i += 1
      else {
        // attribute name
        val a0 = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
          s.charAt(i) != '=' && s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
        val aname = s.substring(a0, i).toLowerCase(Locale.ROOT)
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        var avalue = ""
        if (i < s.length && s.charAt(i) == '=') {
          i += 1
          while (i < s.length && s.charAt(i).isWhitespace) i += 1
          if (i < s.length && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i); i += 1
            val v0 = i
            while (i < s.length && s.charAt(i) != q) i += 1
            avalue = s.substring(v0, math.min(i, s.length))
            if (i < s.length) i += 1
          } else {
            val v0 = i
            while (i < s.length && !s.charAt(i).isWhitespace && s.charAt(i) != '>') i += 1
            avalue = s.substring(v0, i)
          }
        }
        if (aname.nonEmpty) attrs += aname -> avalue
      }
    }
    Some(Tag(name, attrs.result(), i, closing))
  }

  /** Skip `<!-- -->` comments, `<!DOCTYPE>`, `<![CDATA[ ]]>`. Returns the
    * index after the construct, or start+1 if not special. */
  private def skipSpecial(s: String, start: Int): Int = {
    if (start + 1 >= s.length) return start + 1
    if (s.startsWith("<!--", start)) {
      val e = s.indexOf("-->", start + 4)
      if (e < 0) s.length else e + 3
    } else if (s.startsWith("<![CDATA[", start)) {
      val e = s.indexOf("]]>", start + 9)
      if (e < 0) s.length else e + 3
    } else if (s.charAt(start + 1) == '!' || s.charAt(start + 1) == '?') {
      val e = s.indexOf('>', start)
      if (e < 0) s.length else e + 1
    } else start + 1
  }

  private val entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–", "hellip" -> "…")

  /** Decode named + numeric character references. Unknown refs pass through. */
  def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded =
            if (body.startsWith("#x") || body.startsWith("#X"))
              scala.util.Try(Integer.parseInt(body.substring(2), 16).toChar.toString).toOption
            else if (body.startsWith("#"))
              scala.util.Try(Integer.parseInt(body.substring(1)).toChar.toString).toOption
            else entities.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Raw-text elements whose content is never links/text (jericho and jsoup
    * both elide these). */
  private val rawText = Set("script", "style")

  /** Block-level elements: boundaries count as whitespace in text extraction. */
  private val blockTags = Set("br", "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "table", "tr", "td", "th", "section", "article", "title",
    "header", "footer", "blockquote", "pre", "hr", "body", "head")

  /** Extract href values of `<a>` anchors, skipping rel=nofollow ones
    * (≙ extraction.clj:19-25 "html->links ... remove nofollow") and
    * resolving nothing — callers resolve against the (possibly `<base>`
    * overridden) base URL. Returns (baseHrefOpt, hrefs in document order).
    */
  def extractLinksRaw(html: String): (Option[String], Seq[String]) = {
    if (html == null) return (None, Nil)
    val out = ArrayBuffer.empty[String]
    // at most ONE lowered copy per document, computed on first raw-text
    // element — recomputing per <script>/<style> occurrence was O(tags ×
    // length) allocation in the hottest extraction path (ADVICE r2)
    lazy val lower = html.toLowerCase(Locale.ROOT)
    var baseHref: Option[String] = None
    var i = 0
    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = html.length
      else if (lt + 1 < html.length && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?'))
        i = skipSpecial(html, lt)
      else parseTag(html, lt) match {
        case None => i = lt + 1
        case Some(t) =>
          i = t.end
          if (!t.closing) {
            if (rawText(t.name)) {
              // skip to the matching close tag; raw-text content may contain '<'
              val close = lower.indexOf(s"</${t.name}", i)
              i = if (close < 0) html.length else close
            } else if (t.name == "base" && baseHref.isEmpty && t.attrs.contains("href")) {
              baseHref = Some(decodeEntities(t.attrs("href")).trim)
            } else if (t.name == "a") {
              val rel = t.attrs.getOrElse("rel", "")
              val noFollow = rel.toLowerCase(Locale.ROOT)
                .split("[\\s,]+").contains("nofollow")
              t.attrs.get("href").filter(_.nonEmpty).filterNot(_ => noFollow)
                .foreach(h => out += decodeEntities(h).trim)
            }
          }
      }
    }
    (baseHref, out.toSeq)
  }

  /** Links of a page resolved + canonicalized against its URL, nofollow
    * removed, document order, `<base href>` honored. */
  def extractLinks(html: String, pageUrl: String): Seq[String] = {
    val (baseOpt, hrefs) = extractLinksRaw(html)
    val base = baseOpt.flatMap(b => UrlNorm.resolve(pageUrl, b)).getOrElse(pageUrl)
    hrefs.flatMap(h => UrlNorm.resolve(base, h))
  }

  /** Visible text: tags stripped, script/style/comment content elided,
    * entities decoded, whitespace collapsed (≙ html->text,
    * jericho.clj:39-46 / jsoup.clj:33-38). */
  def extractText(html: String): String = {
    if (html == null) return ""
    val sb = new StringBuilder
    lazy val lower = html.toLowerCase(Locale.ROOT) // one copy per call, on demand
    var i = 0
    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { sb.append(html.substring(i)); i = html.length }
      else {
        sb.append(html.substring(i, lt))
        if (lt + 1 < html.length && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?'))
          i = skipSpecial(html, lt)
        else parseTag(html, lt) match {
          case None => sb.append('<'); i = lt + 1
          case Some(t) =>
            i = t.end
            if (!t.closing && rawText(t.name)) {
              val close = lower.indexOf(s"</${t.name}", i)
              i = if (close < 0) html.length else close
            } else if (blockTags(t.name)) {
              sb.append(' ') // block boundary (open or close) separates words
            }
        }
      }
    }
    decodeEntities(sb.toString).split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** Contents of `<code>`/`<pre>` elements in document order (≙ html->code,
    * `util/extraction.clj:35-41`): verbatim inner text with nested tags
    * stripped and entities decoded; nested pre>code emits once. */
  def extractCode(html: String): Seq[String] = {
    if (html == null) return Nil
    val out = ArrayBuffer.empty[String]
    val lower = html.toLowerCase(Locale.ROOT)
    var i = 0
    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = html.length
      else if (lt + 1 < html.length && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?'))
        i = skipSpecial(html, lt)
      else parseTag(html, lt) match {
        case None => i = lt + 1
        case Some(t) =>
          i = t.end
          if (!t.closing && (t.name == "code" || t.name == "pre")) {
            val close = lower.indexOf(s"</${t.name}", i)
            val end = if (close < 0) html.length else close
            val inner = html.substring(i, end)
            // strip nested tags (e.g. <pre><code>), decode entities
            out += decodeEntities(inner.replaceAll("<[^>]*>", ""))
            i = if (close < 0) html.length else lower.indexOf('>', close) + 1
            if (i <= 0) i = html.length
          } else if (!t.closing && rawText(t.name)) {
            val close = lower.indexOf(s"</${t.name}", i)
            i = if (close < 0) html.length else close
          }
      }
    }
    out.toSeq
  }

  // ≙ the reference's LaTeX patterns (util/extraction.clj:51-58): $...$ /
  // $$...$$ spans with no unescaped $ inside, plus \[...\] and \(...\) forms
  private val dollarLatex =
    java.util.regex.Pattern.compile("""(?<![$\\])([$]{1,2})[^$\n]+(?<!\\)\1(?!\$)""")
  private val squareLatex = java.util.regex.Pattern.compile("""\\\[.*\\\]""")
  private val parenLatex = java.util.regex.Pattern.compile("""\\\(.*\\\)""")

  /** LaTeX math spans found in text, dollar forms first then bracket forms
    * (≙ find-latex, extraction.clj:54-58). */
  def findLatex(s: String): Seq[String] = {
    if (s == null) return Nil
    def all(p: java.util.regex.Pattern): Seq[String] = {
      val m = p.matcher(s)
      val out = ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toSeq
    }
    all(dollarLatex) ++ all(squareLatex) ++ all(parenLatex)
  }

  /** Math markup of a page: LaTeX spans of the visible text
    * (≙ html->math default + find-latex). */
  def extractMath(html: String): Seq[String] = findLatex(extractText(html))

  /** `lang` attribute values of all elements in document order
    * (≙ html->lang-attrs, `util/extraction.clj:27-34`, collected by the
    * jericho engine at `util/extraction/jericho.clj:52-58` / jsoup at
    * `jsoup.clj:46-48`). Comment/script/style content never contributes;
    * empty attribute values are kept out (an empty `lang` declares nothing). */
  def extractLangAttrs(html: String): Seq[String] = {
    if (html == null) return Nil
    val out = ArrayBuffer.empty[String]
    lazy val lower = html.toLowerCase(Locale.ROOT)
    var i = 0
    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = html.length
      else if (lt + 1 < html.length && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?'))
        i = skipSpecial(html, lt)
      else parseTag(html, lt) match {
        case None => i = lt + 1
        case Some(t) =>
          i = t.end
          if (!t.closing) {
            if (rawText(t.name)) {
              val close = lower.indexOf(s"</${t.name}", i)
              i = if (close < 0) html.length else close
            } else t.attrs.get("lang").map(v => decodeEntities(v).trim)
              .filter(_.nonEmpty).foreach(out += _)
          }
      }
    }
    out.toSeq
  }

  /** `<title>` content, entity-decoded and whitespace-collapsed
    * (≙ html->title, jericho.clj:48-53). Empty string when absent. */
  def extractTitle(html: String): String = {
    if (html == null) return ""
    val lower = html.toLowerCase(Locale.ROOT)
    val open = lower.indexOf("<title")
    if (open < 0) return ""
    val gt = html.indexOf('>', open)
    if (gt < 0) return ""
    val close = lower.indexOf("</title", gt)
    val raw = if (close < 0) html.substring(gt + 1) else html.substring(gt + 1, close)
    decodeEntities(raw).split("\\s+").filter(_.nonEmpty).mkString(" ")
  }
}
