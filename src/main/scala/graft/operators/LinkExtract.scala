package graft.operators

import graft.functions.Html
import graft.sources.SynthWeb

/** Pluggable link extraction for the crawl round (X1): the round's link
  * stage is extractor-agnostic — it consumes canonical out-links of a fetched
  * page, however they are produced (≙ the reference's extraction multimethod
  * dispatch, `/root/reference/src/clj/ramper/util/extraction.clj:19-25`,
  * which swaps jericho/jsoup engines behind one interface).
  */
trait LinkExtractor extends Serializable {
  /** Canonical (resolved + normalized) out-links of the page at `url` with
    * fetched payload `body`, in document order. */
  def links(url: String, body: Array[Byte]): Seq[String]

  /** Whether the extractor reads the fetched payload. When false the round
    * never ships the (heavy) bytes column through the link stage. */
  def needsBody: Boolean = false
}

/** Fast path for the synthetic graph: out-links are a pure function of the
  * URL (≙ BUbiNG's graph-server protocol, reference README.md:36-41). */
final class SyntheticLinkExtractor(web: SynthWeb) extends LinkExtractor {
  def links(url: String, body: Array[Byte]): Seq[String] =
    web.links(url).flatMap(h => graft.functions.UrlNorm.resolve(url, h))
}

/** Real-content path: the server wraps each image+caption page in HTML and
  * the engine extracts anchors with the real parser ([[Html.extractLinks]] —
  * nofollow-aware, base-href-aware, comment/script-blind). Under the
  * deterministic renderer this must reproduce the synthetic graph exactly,
  * which the equivalence test pins. */
final class HtmlPageExtractor(web: SynthWeb) extends LinkExtractor {
  def links(url: String, body: Array[Byte]): Seq[String] =
    Html.extractLinks(web.htmlBody(url), url)
}
