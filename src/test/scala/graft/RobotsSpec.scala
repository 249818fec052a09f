package graft

import graft.operators.Robots
import org.scalatest.funsuite.AnyFunSuite

/** Table-driven parser tests (≙ the parse shapes of util/robots.clj:16-56). */
class RobotsSpec extends AnyFunSuite {

  test("basic star block") {
    val r = Robots.parse(
      """User-agent: *
        |Disallow: /private
        |Disallow: /tmp
        |Crawl-delay: 3
        |Sitemap: http://x.test/sitemap.xml
        |""".stripMargin)
    assert(r.disallow == Seq("/private", "/tmp"))
    assert(r.crawlDelaySec.contains(3))
    assert(r.sitemaps == Seq("http://x.test/sitemap.xml"))
  }

  test("agent-specific block wins over star") {
    val body =
      """User-agent: *
        |Disallow: /a
        |
        |User-agent: graft
        |Disallow: /b
        |Crawl-delay: 7
        |""".stripMargin
    assert(Robots.parse(body, "graft").disallow == Seq("/b"))
    assert(Robots.parse(body, "graft").crawlDelaySec.contains(7))
    assert(Robots.parse(body, "other").disallow == Seq("/a"))
  }

  test("grouped agents share a block; comments and blanks ignored") {
    val body =
      """# a comment
        |User-agent: a
        |User-agent: b
        |Disallow: /x  # trailing comment
        |""".stripMargin
    assert(Robots.parse(body, "a").disallow == Seq("/x"))
    assert(Robots.parse(body, "B").disallow == Seq("/x"))
  }

  test("empty disallow allows all; missing agent -> empty rules") {
    assert(Robots.parse("User-agent: *\nDisallow:\n").disallow.isEmpty)
    assert(Robots.parse("User-agent: z\nDisallow: /q\n", "notz") == Robots.empty)
  }

  test("admission predicate") {
    assert(Robots.allowed("/public/x", Seq("/private")))
    assert(!Robots.allowed("/private/x", Seq("/private")))
    assert(Robots.allowed("/anything", Nil))
  }
}
