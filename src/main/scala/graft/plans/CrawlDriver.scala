package graft.plans

import graft.{CrawlConfig, RoundMetrics}
import graft.sources.{SynthWeb, TableIO}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The round loop (≙ the reference's agent assembly + shutdown-condition
  * loop, `/root/reference/src/clj/ramper/agent.clj:27-117`; stop conditions
  * `frontier.clj:227-233`): bootstrap-or-resume, run deterministic rounds,
  * commit each round through [[TableIO]], stop on max-urls / empty frontier /
  * round budget.
  *
  * Checkpoint/resume: state lives ONLY in committed tables; each round reads
  * the previous round's Parquet (which also truncates Spark lineage, so the
  * DAG stays O(1) per round). Killing the job between commits loses at most
  * the in-flight round; rerunning reproduces it bit-identically because the
  * round is a pure function of (committed state, round index, config).
  */
final class CrawlDriver(spark: SparkSession, cfg: CrawlConfig, val workDir: String) {
  private val io = new TableIO(workDir, spark)
  private val web = new SynthWeb(cfg)
  private val configHash = cfg.hashCode().toHexString

  private def corpusWithIdx(): DataFrame = {
    val corpusDir = io.tablePath("corpus", 0)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusDir)))
      SynthWeb.corpus(spark, cfg).write.mode("overwrite").parquet(corpusDir)
    spark.read.parquet(corpusDir)
      .withColumn("corpus_idx", expr("cast(substring(image_id, 4, 9) as long)"))
  }

  private def loadState(round: Int): CrawlState = CrawlState(
    frontier = io.readSnapshot("frontier", round),
    seen = io.readDeltas("seen", round),
    hostState = io.readSnapshot("host_state", round),
    ipState = io.readSnapshot("ip_state", round))

  /** Run (or resume) the crawl. Returns per-round metrics. */
  def run(seedUrls: Seq[String], maxRounds: Int, maxUrls: Long): Seq[RoundMetrics] = {
    val corpus = corpusWithIdx()
    val startRound = io.latestRound() match {
      case Some(r) => r
      case None =>
        val st = CrawlRound.bootstrap(spark, web, cfg, seedUrls)
        val cF = io.writeSnapshot("frontier", 0, st.frontier)
        val cS = io.writeSnapshot("seen", 0, st.seen)
        val cH = io.writeSnapshot("host_state", 0, st.hostState)
        val cI = io.writeSnapshot("ip_state", 0, st.ipState)
        io.commit(0, configHash, Map("frontier" -> cF, "seen" -> cS,
          "host_state" -> cH, "ip_state" -> cI, "pages" -> 0L))
        0
    }
    var totalPages = countsOf(startRound).getOrElse("pages_total", 0L)
    var seenTotal = countsOf(startRound).getOrElse("seen_total",
      io.readDeltas("seen", startRound).count())
    val metrics = scala.collection.mutable.ArrayBuffer.empty[RoundMetrics]
    var r = startRound
    var stop = false
    while (r < startRound + maxRounds && !stop) {
      val t0 = System.nanoTime()
      val round = r + 1
      val state = loadState(r)
      val res = CrawlRound.run(spark, state, corpus, web, cfg, round, seenTotal)
      val dequeuedCnt = res.cached.head.count() // fetched (cached) drives the round
      val cF = io.writeSnapshot("frontier", round, res.frontier)
      val cSeenDelta = io.writeSnapshot("seen", round, res.seenDelta)
      val cH = io.writeSnapshot("host_state", round, res.hostState)
      val cI = io.writeSnapshot("ip_state", round, res.ipState)
      val cP = io.writeSnapshot("pages", round, res.pagesDelta)
      val fetchErrors = res.cached.head.filter(col("status") === -1).count()
      val hostsNew = res.hostState.count() - state.hostState.count()
      val hostsPurged = res.hostState.filter(col("status") === "dead").count()
      seenTotal += cSeenDelta
      totalPages += cP
      val m = RoundMetrics(round, round.toLong * cfg.roundTickMs, dequeuedCnt,
        cP, fetchErrors, 0L, cSeenDelta, dequeuedCnt, hostsNew, hostsPurged,
        (System.nanoTime() - t0) / 1000000L)
      import spark.implicits._
      io.writeSnapshot("metrics", round, Seq(m).toDF())
      io.commit(round, configHash, Map("frontier" -> cF, "seen_delta" -> cSeenDelta,
        "seen_total" -> seenTotal, "host_state" -> cH, "ip_state" -> cI,
        "pages" -> cP, "pages_total" -> totalPages))
      res.cached.foreach(_.unpersist())
      metrics += m
      if (totalPages >= maxUrls || cF == 0) stop = true
      r = round
    }
    metrics.toSeq
  }

  private def countsOf(round: Int): Map[String, Long] = {
    if (round < 0) return Map.empty
    val js = io.readManifest(round)
    """"(\w+)":\s*(\d+)""".r.findAllMatchIn(js)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  def pages(round: Int): DataFrame = io.readDeltas("pages", round)
  def seen(round: Int): DataFrame = io.readDeltas("seen", round)
  def latestRound(): Option[Int] = io.latestRound()
}
