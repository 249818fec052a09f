package graft.sources

import graft.{CorpusRow, CrawlConfig, RobotsRow}
import graft.functions.{Hashing, Images, UrlNorm}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic web + image/caption corpus.
  *
  * The reference is load-tested against BUbiNG's deterministic graph server
  * (`/root/reference/README.md:36-41`: 100M sites, avg degree 50, 0.01%
  * broken). We internalize that idea (SURVEY.md preamble): every "network"
  * observable — link graph, robots rules, DNS, fetch payload, errors — is a
  * pure function of (config.seed, canonical URL), so crawl ordering and the
  * final URL-seen set are exactly reproducible, with zero network.
  *
  * Scale note: host/page counts are config, key widths are 64-bit — the same
  * functions address a 10^10-URL logical space; tests just pick small counts.
  */
final class SynthWeb(cfg: CrawlConfig) extends Serializable {

  // memoized: the link stage renders ~12M URLs per bench round and
  // String.format dominated its profile; one small immutable array per
  // executor replaces it (pure function of the index)
  @transient private lazy val hostNames: Array[String] =
    Array.tabulate(cfg.numHosts)(i => f"host-$i%06d.test")

  def hostName(i: Int): String =
    if (i >= 0 && i < cfg.numHosts) hostNames(i) else f"host-$i%06d.test"

  /** Total: non-synthetic hostnames (a real seed file mixed in) map
    * deterministically into the host space by hash instead of crashing the
    * bootstrap with a NumberFormatException inside an executor. */
  def hostIndex(host: String): Int =
    host.stripPrefix("host-").takeWhile(_.isDigit).toIntOption
      .getOrElse(Hashing.pmod(Hashing.xxhash64(host), cfg.numHosts.toLong).toInt)

  def url(hostIdx: Int, page: Long): String = {
    val p = Hashing.pmod(page, cfg.pagesPerHost.toLong)
    // every 11th page sits under /private — robots-disallowed on some hosts
    val path = if (p % 11 == 0) s"/private/page/$p" else s"/page/$p"
    s"http://${hostName(hostIdx)}$path"
  }

  /** n seed URLs spread across hosts, then across pages within a host (so
    * n > numHosts yields distinct URLs, filling per-host queues). */
  def seeds(n: Int): Seq[String] =
    (0 until n).map(i => url(i % cfg.numHosts, (i / cfg.numHosts).toLong))

  /** Same seed list, generated distributed (for large n). */
  def seedsDf(spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val self = this
    spark.range(0, n).repartition(32)
      .map(i => self.url((i % cfg.numHosts).toInt, i / cfg.numHosts))
      .toDF("url")
  }

  /** Zipf-ish skewed host pick: quadratic warp concentrates mass on low
    * indices — exercises hot-host skew (SURVEY.md §7 hard part 4). */
  private def skewedHost(r: Long): Int = {
    val u = (Hashing.pmod(r, 1L << 30)).toDouble / (1L << 30).toDouble
    math.min(cfg.numHosts - 1, (u * u * cfg.numHosts).toInt)
  }

  /** Deterministic out-links of a page (≙ X1 link extraction against the
    * graph server). 70% same-host, 30% skewed cross-host. */
  def links(canonicalUrl: String): Seq[String] = {
    val h = Hashing.xxhash64(canonicalUrl) ^ cfg.seed
    val sameHostIdx = UrlNorm.parse(canonicalUrl).map(p => hostIndex(p.host)).getOrElse(0)
    val draws = Hashing.splitmixStream(h, cfg.outDegree * 2)
    (0 until cfg.outDegree).map { j =>
      val hostIdx =
        if (Hashing.pmod(draws(2 * j), 10L) < 7) sameHostIdx
        else skewedHost(draws(2 * j) >>> 7)
      url(hostIdx, Hashing.pmod(draws(2 * j + 1), cfg.pagesPerHost.toLong))
    }
  }

  /** Deterministic failure class for a (broken) host — spreads hosts across
    * the whole policy table so killer purges, transient retries, and
    * zero-retry URL drops are all exercised (≙ the per-exception variety of
    * constants.clj:6-43). */
  def errorClass(host: String): String = {
    val cs = graft.operators.Fetch.errorClasses
    cs(Hashing.pmod(Hashing.splitmix64(cfg.seed ^ Hashing.xxhash64(host)), cs.length.toLong).toInt)
  }

  def isBrokenHost(hostIdx: Int): Boolean =
    Hashing.pmod(Hashing.splitmix64(cfg.seed ^ (hostIdx.toLong << 17)), 1000000L) <
      (cfg.brokenHostFraction * 1000000L).toLong

  /** Synthetic DNS: ip is a pure function of host; numHosts/4 distinct IPs so
    * several hosts share one address (exercises the two-level politeness of
    * `workbench_entry.clj:55-59`). */
  def resolveIp(host: String): Long = {
    val numIps = math.max(1, cfg.numHosts / 4)
    Hashing.pmod(Hashing.splitmix64(Hashing.xxhash64(host) ^ cfg.seed), numIps.toLong)
  }

  /** Robots rules per host (≙ util/robots.clj parse output): every 5th host
    * disallows /private, every 7th doubles its crawl delay. */
  def robots(host: String): RobotsRow = {
    val i = hostIndex(host)
    val dis = if (i % 5 == 0) Seq("/private") else Seq.empty[String]
    val delay = if (i % 7 == 0) cfg.hostDelayMs * 2 else cfg.hostDelayMs
    RobotsRow(host, dis, delay)
  }

  /** Deterministic HTML rendering of a page: its out-links as anchors plus
    * parser traps (comment/script decoys, a nofollow anchor, entity-escaped
    * hrefs) — the "served page" for the real-content extraction path. The
    * [[graft.functions.Html]] parser over this must reproduce `links` exactly. */
  def htmlBody(canonicalUrl: String): String = {
    val ls = links(canonicalUrl)
    val anchors = ls.zipWithIndex.map { case (l, j) =>
      val href = if (j % 3 == 0) l.replace("&", "&amp;") else l
      s"""<a class="out" href="$href">link $j</a>"""
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><title>Synthetic page</title>
       |<style>a { color: #000 } /* <a href="http://decoy-style.test/">x</a> */</style>
       |</head><body>
       |<!-- <a href="http://decoy-comment.test/">never follow</a> -->
       |<script>var s = '<a href="http://decoy-script.test/">nope</a>';</script>
       |<a rel="nofollow" href="http://decoy-nofollow.test/skip">sponsored</a>
       |$anchors
       |</body></html>""".stripMargin
  }

  /** robots.txt *text* for a host — exercised by the real parser in tests. */
  def robotsTxt(host: String): String = {
    val r = robots(host)
    val dis = r.disallow.map(d => s"Disallow: $d").mkString("\n")
    s"User-agent: *\n$dis\nCrawl-delay: ${r.crawl_delay_ms / 1000}\n"
  }

  /** Which corpus row a URL's page carries: pick = xxhash64(url) mod corpus
    * (FIXTURES.md §B2). */
  def corpusPick(urlHash: Long): Long = Hashing.pmod(urlHash, cfg.corpusSize.toLong)

  /** Deterministic fetch status for a live host: 2% 404, else 200.
    * Formula uses xxhash64-of-long so the fetch stage can compute it with the
    * codegen'd built-in `functions.xxhash64` instead of a UDF. */
  def httpStatus(urlHash: Long): Int =
    if (Hashing.pmod(Hashing.xxhash64Long(urlHash), 50L) == 0L) 404 else 200
}

object SynthWeb {

  /** Deterministic caption: seeded token sequence (exact-equality checked
    * per input_hint). */
  def caption(i: Long, seed: Long): String = {
    val words = Array("amber", "basalt", "cirrus", "dune", "ember", "fjord",
      "glacier", "harbor", "isle", "juniper", "karst", "lagoon", "mesa",
      "nimbus", "oasis", "prairie", "quartz", "reef", "summit", "tundra")
    val draws = Hashing.splitmixStream(Hashing.splitmix64(seed ^ i), 6)
    val toks = draws.map(d => words(Hashing.pmod(d, words.length.toLong).toInt))
    s"caption $i: " + toks.mkString(" ")
  }

  /** Build one corpus row. Every 97th row re-encodes the pixels of row i-97
    * (a near-duplicate under phash, distinct bytes — FIXTURES.md §B1); the
    * chain is chased so all multiples of 97 form one duplicate cluster. */
  def corpusRow(i: Long, cfg: CrawlConfig): CorpusRow = {
    var dupOf = i
    while (dupOf >= 97 && dupOf % 97 == 0) dupOf -= 97
    val dims = Array(1, 2, 4)
    val w = cfg.imageSize * dims((dupOf % 3).toInt)
    val h = cfg.imageSize * dims(((dupOf / 3) % 3).toInt)
    val px = Images.synthPixels(Hashing.splitmix64(cfg.seed ^ (dupOf * 0x9E37L)), w, h)
    val fmt = if (i % 2 == 0) "png" else "jpeg"
    val bytes = if (fmt == "png") Images.encodePng(px, w, h) else Images.encodeJpeg(px, w, h)
    CorpusRow(f"img$i%09d", bytes, w, h, fmt, caption(i, cfg.seed), Images.phash64(px, w, h))
  }

  /** Bump when the GENERATION CODE of [[corpus]]/[[corpusRow]] changes —
    * cross-run corpus caches (Bench) key on (this, seed/corpusSize/imageSize);
    * a code change without a version bump would silently serve stale rows. */
  val corpusFormatVersion = 1

  /** Distributed corpus generation — the input-side "Iceberg table of image +
    * caption pairs". Generated once per run, then fetch is a pure join. */
  def corpus(spark: SparkSession, cfg: CrawlConfig): Dataset[CorpusRow] = {
    import spark.implicits._
    spark.range(0, cfg.corpusSize.toLong)
      .repartition(math.min(cfg.corpusSize, 32))
      .map((i: java.lang.Long) => corpusRow(i, cfg))
  }
}
