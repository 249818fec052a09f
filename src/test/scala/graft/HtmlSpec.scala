package graft

import graft.functions.Html
import graft.operators.{HtmlPageExtractor, SyntheticLinkExtractor}
import graft.plans.CrawlDriver
import graft.sources.SynthWeb
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** HTML extraction (X1 + X5): parser semantics (≙ util/extraction.clj:19-25
  * nofollow handling; jericho.clj/jsoup.clj engine behavior) and the
  * real-content crawl path — parsing rendered pages must reproduce the
  * synthetic graph bit-for-bit.
  */
class HtmlSpec extends AnyFunSuite {

  test("extractLinks: anchors in order, nofollow skipped, base href honored") {
    val html =
      """<html><head><base href="http://base.test/dir/"></head><body>
        |<a href="a.html">rel</a>
        |<A HREF='http://abs.test/x'>abs</A>
        |<a rel="nofollow" href="http://no.test/">no</a>
        |<a rel="ugc nofollow" href="http://no2.test/">no</a>
        |<a href="/root.html">root</a>
        |</body></html>""".stripMargin
    val links = Html.extractLinks(html, "http://page.test/p/q")
    assert(links == Seq(
      "http://base.test/dir/a.html",
      "http://abs.test/x",
      "http://base.test/root.html"))
  }

  test("extractLinks: comments, scripts, styles and CDATA are blind spots") {
    val html =
      """<body>
        |<!-- <a href="http://c.test/">c</a> -->
        |<script>document.write('<a href="http://s.test/">s</a>');</script>
        |<style>/* <a href="http://st.test/">st</a> */</style>
        |<![CDATA[ <a href="http://cd.test/">cd</a> ]]>
        |<a href="http://real.test/ok">ok</a>
        |</body>""".stripMargin
    assert(Html.extractLinks(html, "http://p.test/") == Seq("http://real.test/ok"))
  }

  test("extractLinks: entity-escaped hrefs, unquoted attrs, malformed tail") {
    val html =
      """<a href="http://e.test/?a=1&amp;b=2">e</a>
        |<a href=http://u.test/unquoted>u</a>
        |<a href="">empty</a>
        |<a name="anchor-only">x</a>
        |<a href="http://t.test/tail
        |""".stripMargin
    val links = Html.extractLinks(html, "http://p.test/")
    assert(links.take(2) == Seq("http://e.test/?a=1&b=2", "http://u.test/unquoted"))
    assert(links.size <= 3) // empty + name-only dropped; truncated tag tolerated
  }

  test("extractText: tags stripped, raw text elided, entities decoded") {
    val html =
      """<html><head><title>T</title><script>ignore()</script></head>
        |<body><h1>Hello &amp; goodbye</h1><p>two  words</p><!-- x --></body></html>"""
        .stripMargin
    assert(Html.extractText(html) == "T Hello & goodbye two words")
  }

  test("extractCode: pre/code captured once, script decoys skipped") {
    val html =
      """<body><pre><code>val x = 1 &lt; 2</code></pre>
        |<script>var s = '<code>decoy</code>';</script>
        |<p>text</p><code>inline()</code></body>""".stripMargin
    assert(Html.extractCode(html) == Seq("val x = 1 < 2", "inline()"))
  }

  test("findLatex: dollar spans, escaped dollars, bracket forms") {
    val s = """cost is \$5, math $a+b$ and $$c^2$$ plus \(x\) and \[y\] end"""
    val found = Html.findLatex(s)
    assert(found.contains("$a+b$"))
    assert(found.contains("$$c^2$$"))
    assert(found.contains("""\(x\)"""))
    assert(found.contains("""\[y\]"""))
    assert(!found.exists(_.contains("5,")), s"escaped dollar matched: $found")
  }

  test("extractLangAttrs: document order, decoys blind, empties dropped") {
    val html =
      """<html lang="en"><head><script>var x = '<p lang="xx">d</p>';</script></head>
        |<body><!-- <i lang="zz">c</i> --><div lang="">e</div>
        |<p lang="fr-CA">bonjour</p><span LANG='de'>x</span>
        |<td lang="pt&amp;br">y</td></body></html>""".stripMargin
    assert(Html.extractLangAttrs(html) == Seq("en", "fr-CA", "de", "pt&br"))
    assert(Html.extractLangAttrs("<p>none</p>") == Nil)
    assert(Html.extractLangAttrs(null) == Nil)
  }

  test("extractTitle") {
    assert(Html.extractTitle("<html><title> A &amp;\n B </title></html>") == "A & B")
    assert(Html.extractTitle("<html><body>no title</body></html>") == "")
  }

  test("HtmlPageExtractor reproduces the synthetic graph on rendered pages") {
    val cfg = CrawlConfig(numHosts = 16, pagesPerHost = 24, outDegree = 7)
    val web = new SynthWeb(cfg)
    val synth = new SyntheticLinkExtractor(web)
    val html = new HtmlPageExtractor(web)
    assert(html.needsBody, "the real-content extractor must consume fetched bytes")
    (0 until 16).foreach { i =>
      val u = web.url(i, (i * 3).toLong)
      val body = web.htmlBody(u).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(html.links(u, body) == synth.links(u, null), s"extractor mismatch at $u")
    }
  }

  test("end-to-end: crawling via HTML parsing equals crawling the graph directly") {
    val spark = TestSpark.spark
    val cfg = CrawlConfig(numHosts = 10, pagesPerHost = 16, outDegree = 4,
      corpusSize = 32, imageSize = 16, numBuckets = 8, keepAliveBatch = 2,
      brokenHostFraction = 0.0)
    val web = new SynthWeb(cfg)
    def crawl(ex: Option[graft.operators.LinkExtractor]): (Seq[Long], Seq[Long]) = {
      val d = new CrawlDriver(spark, cfg,
        TestSpark.tempDir("html_e2e"), ex)
      d.run(web.seeds(5), maxRounds = 3, maxUrls = Long.MaxValue)
      val r = d.latestRound().get
      (d.pages(r).select("url_hash").collect().map(_.getLong(0)).toSeq.sorted,
        d.seen(r).select("url_hash").collect().map(_.getLong(0)).toSeq.sorted)
    }
    val (p1, s1) = crawl(None)
    val (p2, s2) = crawl(Some(new HtmlPageExtractor(web)))
    assert(p1 == p2, "pages differ between graph and HTML extraction")
    assert(s1 == s2, "seen set differs between graph and HTML extraction")
  }
}
