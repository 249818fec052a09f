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
    ipState = io.readSnapshot("ip_state", round),
    phashSeen = io.readDeltas("phash_seen", round))

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
        io.writeSnapshot("phash_seen", 0, st.phashSeen)
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
      // all state writes are independent (their inputs are eagerly
      // checkpointed inside the round), so run them as concurrent Spark jobs
      // together with the two metric aggregates — the per-round commit cost
      // is then max(write latencies), not their sum
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fstatsF = Future(res.cached.head.agg(
        count(lit(1)), sum(when(col("status") === -1, 1L).otherwise(0L))).head())
      val hstatsF = Future(res.hostState.agg(
        count(lit(1)), sum(when(col("status") === "dead", 1L).otherwise(0L))).head())
      val writeF = Future.sequence(Seq(
        Future(io.write("frontier", round, res.frontier)),
        Future(io.write("seen", round, res.seenDelta)),
        Future(io.write("host_state", round, res.hostState)),
        Future(io.write("ip_state", round, res.ipState)),
        Future(io.write("pages", round, res.pagesDelta)),
        Future(io.write("phash_seen", round, res.phashSeenDelta))))
      Await.result(writeF, Duration.Inf)
      val countF = Future.sequence(Seq("frontier", "seen", "pages")
        .map(t => Future(t -> io.countRows(t, round))))
      val counts = Await.result(countF, Duration.Inf).toMap
      val cF = counts("frontier"); val cSeenDelta = counts("seen"); val cP = counts("pages")
      val fstats = Await.result(fstatsF, Duration.Inf)
      val hstats = Await.result(hstatsF, Duration.Inf)
      val dequeuedCnt = fstats.getLong(0)
      val fetchErrors = if (fstats.isNullAt(1)) 0L else fstats.getLong(1)
      val cH = hstats.getLong(0)
      val cI = 0L // ip_state row count is not tracked (not used downstream)
      val hostsNew = cH - countsOf(r).getOrElse("host_state", 0L)
      val hostsPurged = if (hstats.isNullAt(1)) 0L else hstats.getLong(1)
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
