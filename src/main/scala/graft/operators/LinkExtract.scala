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

  /** Document-order raw link targets BEFORE resolution, paired with
    * [[resolveTarget]] — the split lets the round memoize canonicalization
    * of absolute targets across pages (resolution of a scheme-prefixed
    * target is base-independent per RFC 3986, which every implementation
    * must preserve). Contract: `rawTargets(u,b).flatMap(resolveTarget(u,_))`
    * ≡ `links(u,b)`. Default: already-resolved links + identity resolve. */
  def rawTargets(url: String, body: Array[Byte]): Seq[String] = links(url, body)

  /** Resolve one raw target against the page URL to canonical form.
    * MUST be base-independent when `raw` starts with "http://"/"https://". */
  def resolveTarget(base: String, raw: String): Option[String] = Some(raw)

  /** Whether the extractor reads the fetched payload. When false the round
    * never ships the (heavy) bytes column through the link stage. */
  def needsBody: Boolean = false
}

/** Fast path for the synthetic graph: out-links are a pure function of the
  * URL (≙ BUbiNG's graph-server protocol, reference README.md:36-41).
  *
  * `resolveTarget` is the identity: [[SynthWeb.url]] emits URLs that are
  * already in canonical form (lowercase registered host, no default port,
  * no dot-segments, nothing percent-encodable), so re-running the full
  * canonicalizer over ~12M targets/round was pure overhead. The invariant
  * `canonicalize(url) == url` is pinned by UrlNormSpec, and the end-to-end
  * equivalence test against [[HtmlPageExtractor]] (whose links DO go through
  * resolution) would catch any drift. */
final class SyntheticLinkExtractor(web: SynthWeb) extends LinkExtractor {
  override def rawTargets(url: String, body: Array[Byte]): Seq[String] =
    web.links(url)
  override def resolveTarget(base: String, raw: String): Option[String] =
    Some(raw)
  def links(url: String, body: Array[Byte]): Seq[String] =
    rawTargets(url, body)
}

/** Real-content path: the server serves each page's HTML rendering as the
  * fetch payload (`page_bytes`) and the engine parses THOSE bytes with the
  * real parser ([[Html.extractLinks]] — nofollow-aware, base-href-aware,
  * comment/script-blind) — the reference's parse-what-you-fetched contract
  * (`workers/parsing_thread.clj:37-74`: the parsing thread consumes the
  * fetched response body, never re-fetches). Under the deterministic
  * renderer this must reproduce the synthetic graph exactly, which the
  * equivalence test pins end-to-end through the bytes column. */
final class HtmlPageExtractor(web: SynthWeb) extends LinkExtractor {
  override def needsBody: Boolean = true
  def links(url: String, body: Array[Byte]): Seq[String] =
    if (body == null) Nil
    else Html.extractLinks(
      new String(body, java.nio.charset.StandardCharsets.UTF_8), url)
}
