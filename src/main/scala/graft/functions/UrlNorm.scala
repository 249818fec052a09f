package graft.functions

import java.util.Locale

/** URL canonicalization — the rebuild's equivalent of the reference's
  * normalized URI form (`/root/reference/src/clj/ramper/util/url.clj:46-53`:
  * lowercase scheme/host, drop fragment, drop user/password, default-port
  * elision) and its scheme+authority / path+query splits
  * (`url.clj:11-24`).
  *
  * Pure Scala (no Spark types) so it is property-testable and usable both
  * driver-side (seed loading) and inside Catalyst expressions / UDFs.
  */
object UrlNorm {

  final case class ParsedUrl(scheme: String, host: String, port: Int, pathQuery: String) {
    /** scheme://host[:port] — the per-host politeness key
      * (≙ ramper's scheme+authority, url.clj:11-18). */
    def schemeAuthority: String = {
      val defaultPort = if (scheme == "https") 443 else 80
      if (port == defaultPort || port < 0) s"$scheme://$host"
      else s"$scheme://$host:$port"
    }
    def canonical: String = schemeAuthority + pathQuery
  }

  /** Canonicalize a URL string:
    *  - lowercase scheme and host
    *  - strip fragment (#...) and userinfo (user:pass@)
    *  - elide default ports (:80 http, :443 https)
    *  - empty path -> "/"
    *  - collapse duplicate slashes in the path, resolve "." / ".." segments
    *  - uppercase percent-escapes (%2f -> %2F)
    * Returns None for non-http(s) or unparseable input.
    */
  def parse(raw: String): Option[ParsedUrl] = {
    if (raw == null) return None
    val s0 = raw.trim
    val schemeEnd = s0.indexOf("://")
    if (schemeEnd <= 0) return None
    val scheme = s0.substring(0, schemeEnd).toLowerCase(Locale.ROOT)
    if (scheme != "http" && scheme != "https") return None
    var rest = s0.substring(schemeEnd + 3)
    // strip fragment first (fragment may contain anything)
    val hashIdx = rest.indexOf('#')
    if (hashIdx >= 0) rest = rest.substring(0, hashIdx)
    // authority ends at first '/' or '?'
    var authEnd = rest.length
    var i = 0
    var found = false
    while (i < rest.length && !found) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') { authEnd = i; found = true }
      i += 1
    }
    var auth = rest.substring(0, authEnd)
    val pathAndQuery = rest.substring(authEnd)
    // strip userinfo
    val atIdx = auth.lastIndexOf('@')
    if (atIdx >= 0) auth = auth.substring(atIdx + 1)
    if (auth.isEmpty) return None
    // split host:port
    val colonIdx = auth.lastIndexOf(':')
    val (hostRaw, port) =
      if (colonIdx >= 0 && auth.drop(colonIdx + 1).forall(_.isDigit) && colonIdx + 1 < auth.length)
        (auth.substring(0, colonIdx), auth.substring(colonIdx + 1).toInt)
      else (auth, -1)
    if (hostRaw.isEmpty) return None
    val host = hostRaw.toLowerCase(Locale.ROOT)
    val defaultPort = if (scheme == "https") 443 else 80
    val normPort = if (port == defaultPort) -1 else port
    // normalize path+query: percent-normalize FIRST (decoded %2E dots then
    // participate in dot-segment resolution), then resolve segments
    val qIdx = pathAndQuery.indexOf('?')
    val (rawPath, query) =
      if (qIdx >= 0) (pathAndQuery.substring(0, qIdx), pathAndQuery.substring(qIdx))
      else (pathAndQuery, "")
    val path = normalizePath(normalizePercent(if (rawPath.isEmpty) "/" else rawPath))
    Some(ParsedUrl(scheme, host, normPort, path + normalizePercent(query)))
  }

  /** Collapse "//", resolve "." and "..". Always returns a leading-"/" path. */
  private def normalizePath(p: String): String = {
    val segs = p.split("/", -1).filter(s => s.nonEmpty && s != ".")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    segs.foreach {
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case s    => out += s
    }
    val trailingSlash = p.endsWith("/") && out.nonEmpty
    "/" + out.mkString("/") + (if (trailingSlash) "/" else "")
  }

  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** RFC 3986 unreserved set — the only escapes safe to decode. */
  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  /** Characters legal as-is in a path/query (pchar + '/' + '?'). */
  private def isLegalRaw(c: Char): Boolean =
    isUnreserved(c) || "!$&'()*+,;=:@/?".indexOf(c.toInt) >= 0

  /** Full RFC 3986 percent normalization (≙ lambdaisland normalize,
    * reference `util/url.clj:46-53`): decode escapes of UNRESERVED chars
    * (`%41` ≡ `A`), uppercase the hex of every other escape, and
    * percent-encode (UTF-8) characters that are illegal raw (spaces,
    * controls, non-ASCII, stray `%`). Idempotent by construction: the output
    * alphabet is legal-raw chars + uppercase escapes of non-unreserved
    * values, both of which map to themselves. */
  private[graft] def normalizePercent(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHexDigit(s.charAt(i + 1)) && isHexDigit(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else if (isLegalRaw(c) && c != '%') {
        sb.append(c); i += 1
      } else {
        // encode by code point (surrogate pairs as one UTF-8 sequence)
        val cp =
          if (Character.isHighSurrogate(c) && i + 1 < s.length &&
            Character.isLowSurrogate(s.charAt(i + 1))) {
            i += 2; new String(Array(c, s.charAt(i - 1))).codePointAt(0)
          } else { i += 1; c.toInt }
        new String(Character.toChars(cp)).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => sb.append(f"%%${b & 0xFF}%02X"))
      }
    }
    sb.toString
  }

  /** Canonical string form, or None if invalid. */
  def canonicalize(raw: String): Option[String] = parse(raw).map(_.canonical)

  /** Resolve a possibly-relative href against a base canonical URL
    * (≙ parsing_thread.clj:16-20 create-new-urls). */
  def resolve(base: String, href: String): Option[String] = {
    if (href == null || href.isEmpty) return None
    val h = href.trim
    if (h.startsWith("http://") || h.startsWith("https://")) canonicalize(h)
    else parse(base).flatMap { b =>
      if (h.startsWith("//")) canonicalize(b.scheme + ":" + h)
      else if (h.startsWith("/")) Some(ParsedUrl(b.scheme, b.host, b.port, "").schemeAuthority).flatMap(sa => canonicalize(sa + h))
      else if (h.startsWith("#")) Some(b.canonical)
      else {
        val basePath = {
          val pq = b.pathQuery
          val q = pq.indexOf('?')
          val p = if (q >= 0) pq.substring(0, q) else pq
          p.substring(0, p.lastIndexOf('/') + 1)
        }
        canonicalize(b.schemeAuthority + basePath + h)
      }
    }
  }

  /** 64-bit sieve key of the canonical form (north rule: xxhash64). */
  def urlHash(canonical: String): Long = Hashing.xxhash64(canonical)

  /** (host, pathQuery) of an ALREADY-CANONICAL url by index arithmetic —
    * equals `parse(cu).map(p => (p.host, p.pathQuery))` for every string
    * produced by [[canonicalize]] (pinned by a UrlNormSpec fuzz test), at
    * ~1/20th the cost. The canonical grammar guarantees: lowercase scheme,
    * no userinfo/fragment, authority ends at the first '/', path non-empty.
    * Only call on canonical output; arbitrary input belongs to [[parse]]. */
  def splitCanonical(cu: String): (String, String) = {
    val a0 = cu.indexOf("://") + 3
    val slash = cu.indexOf('/', a0)
    if (a0 < 3 || slash < 0) { // not canonical-shaped; fall back to the parser
      val p = parse(cu).get
      return (p.host, p.pathQuery)
    }
    val auth = cu.substring(a0, slash)
    val colon = auth.lastIndexOf(':')
    val host = if (colon >= 0) auth.substring(0, colon) else auth
    (host, cu.substring(slash))
  }
}
