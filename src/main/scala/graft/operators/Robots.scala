package graft.operators

import java.util.Locale

/** robots.txt parsing + URL admission.
  *
  * Re-expresses the reference's parser (`/root/reference/src/clj/ramper/util/
  * robots.clj:16-56`): per-user-agent blocks, sorted `Disallow` prefixes,
  * optional `Crawl-delay`, `Sitemap` list. The reference parses robots but
  * never wires it into fetch filtering (TODO at `workers/fetching_thread.clj:
  * 40-41`); the north rule makes the filter + crawl-delay token buckets a hard
  * requirement, so admission is a first-class predicate here.
  */
object Robots {

  final case class Rules(
      disallow: Seq[String],       // sorted prefixes
      crawlDelaySec: Option[Int],
      sitemaps: Seq[String])

  val empty: Rules = Rules(Nil, None, Nil)

  /** Parse a robots.txt body for the given agent (falls back to "*" block).
    * Lines: `Field: value`, '#' comments, blank line ends a record group.
    */
  def parse(body: String, agent: String = "*"): Rules = {
    if (body == null) return empty
    final case class Block(agents: List[String], dis: List[String],
                           delay: Option[Int])
    var blocks = List.empty[Block]
    var curAgents = List.empty[String]
    var curDis = List.empty[String]
    var curDelay: Option[Int] = None
    var sawRule = false
    var sitemaps = List.empty[String]
    def flush(): Unit = {
      if (curAgents.nonEmpty) blocks ::= Block(curAgents, curDis.reverse, curDelay)
      curAgents = Nil; curDis = Nil; curDelay = None; sawRule = false
    }
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val idx = line.indexOf(':')
        if (idx > 0) {
          val field = line.substring(0, idx).trim.toLowerCase(Locale.ROOT)
          val value = line.substring(idx + 1).trim
          field match {
            case "user-agent" =>
              if (sawRule) flush()
              curAgents ::= value.toLowerCase(Locale.ROOT)
            case "disallow" =>
              sawRule = true
              if (value.nonEmpty) curDis ::= value
            case "allow" => sawRule = true // recorded-as-seen; prefix allow not modeled
            case "crawl-delay" =>
              sawRule = true
              curDelay = value.toDoubleOption.map(d => math.max(0, math.ceil(d).toInt))
            case "sitemap" => sitemaps ::= value
            case _ => ()
          }
        }
      }
    }
    flush()
    val a = agent.toLowerCase(Locale.ROOT)
    val chosen = blocks.reverse.find(_.agents.contains(a))
      .orElse(blocks.reverse.find(_.agents.contains("*")))
    chosen match {
      case Some(b) => Rules(b.dis.sorted, b.delay, sitemaps.reverse)
      case None    => Rules(Nil, None, sitemaps.reverse)
    }
  }

  /** Admission: path+query not under any disallowed prefix. */
  def allowed(pathQuery: String, disallow: Seq[String]): Boolean =
    disallow == null || !disallow.exists(d => d.nonEmpty && pathQuery.startsWith(d))
}
