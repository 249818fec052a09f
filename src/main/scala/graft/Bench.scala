package graft

import graft.plans.CrawlDriver
import graft.sources.SynthWeb
import org.apache.spark.sql.SparkSession

/** Benchmark main. Two parts, one JSON line out:
  *
  *  1. every SparkEntry query timed on SPARK_GRAFT_SF_DIR (default sf0.1)
  *  2. the crawl round loop on an identical synthetic web at TWO parallelism
  *     levels (N and 4N cores, default local[2] vs local[8]) — the sandbox
  *     substitute for the north rule's N vs 4N executor scaling criterion
  *     (BASELINE.md measurement protocol): efficiency = (thr_hi / thr_lo) /
  *     (cores_hi / cores_lo), target >= 0.8.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // crawl stages are CPU-heavy per byte; keep shuffle partitions from
      // being size-coalesced down to 1-2 tasks (see CrawlMain)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def env(k: String, d: String) = sys.env.getOrElse(k, d)

  private def processCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime / 1e9

  /** Fixed crawl workload (identical input at both levels; seed=42).
    * Decode-heavy per the north rule: every fetched image is decoded and
    * PSNR/caption-verified (verifySample=1), so rounds are genuinely
    * compute-bound rather than stage-latency-bound. Returns
    * (urls, steadyStateSec, processCpuSec). */
  private def crawlRun(cores: Int, rounds: Int): (Long, Double, Double) = {
    val spark = session(cores)
    val cfg = CrawlConfig(
      numHosts = env("SPARK_GRAFT_BENCH_HOSTS", "40000").toInt,
      pagesPerHost = 200, outDegree = 20,
      corpusSize = 4096, imageSize = env("SPARK_GRAFT_BENCH_IMG", "32").toInt,
      keepAliveBatch = env("SPARK_GRAFT_BENCH_BATCH", "32").toInt,
      verifySample = env("SPARK_GRAFT_VERIFY_SAMPLE", "1").toInt,
      // bucket count FIXED across levels (identical partition assignment =
      // identical outputs at N and 4N; the check is count equality)
      numBuckets = 64, maxUrlsPerHost = 500)
    val web = new SynthWeb(cfg)
    // tmpfs workdir: on a real cluster output IO bandwidth scales with
    // executors (local disks per node); a single VM disk does not — tmpfs
    // emulates the per-executor storage path for the scaling measurement
    val base = java.nio.file.Paths.get(
      if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm"))) "/dev/shm" else "/tmp")
    val dir = java.nio.file.Files.createTempDirectory(base, s"bench_crawl_$cores").toString
    val driver = new CrawlDriver(spark, cfg, dir)
    val cpu0 = processCpuSec()
    // seeds fill every host's queue to a full keepalive batch so round 1 is
    // already steady-state, not a ramp round
    val metrics = driver.run(
      web.seedsDf(spark, cfg.numHosts.toLong * cfg.keepAliveBatch),
      maxRounds = rounds, maxUrls = Long.MaxValue)
    val cpu = processCpuSec() - cpu0
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    // steady-state crawl throughput: one-time setup (corpus synthesis,
    // bootstrap write) is excluded; rounds themselves are fully counted
    (metrics.map(_.dequeued).sum, metrics.map(_.wall_ms).sum / 1e3, cpu)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val crawlRounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt

    // part 1: operator queries. A failed query records the sentinel -1.0
    // (never a plausible timing) and prints the error — a broken query must
    // not masquerade as a fast pass in the bench record.
    val spark = session(cpus)
    // one untimed action absorbs session warmup (codegen init, FS probes)
    // so the alphabetically-first query doesn't carry ~3s of one-time cost
    spark.range(1000).selectExpr("sum(id)").collect()
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors += name
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          name -> -1.0
      }
    }
    spark.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    if (sys.env.contains("SPARK_GRAFT_BENCH_SKIP_CRAWL")) {
      val qs0 = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
      val total0 = results.filter(_._2 >= 0).map(_._2).sum
      println(f"""{"metric":"total","value":$total0%.2f,"unit":"sec","queries":$qs0,"sf":"$sfDir"}""")
      return
    }

    // part 2: crawl throughput at two parallelism levels — N and 4N cores.
    // This host supports honest linear scaling only up to ~8-16 busy cores
    // (measured: pure image-encode compute scales 2->8 at 0.86 efficiency,
    // but saturates ~16); N=2 -> 4N=8 is the regime where the scaling
    // criterion is meaningful. Lo level runs first (cold FS caches penalize
    // whichever runs first; lo-first is the conservative order).
    val loCores = env("SPARK_GRAFT_BENCH_LO", "2").toInt
    val hiCores = env("SPARK_GRAFT_BENCH_HI", "8").toInt
    val (urlsLo, secLo, cpuLo) = crawlRun(loCores, crawlRounds)
    val (urlsHi, secHi, cpuHi) = crawlRun(hiCores, crawlRounds)
    val upsLo = urlsLo / secLo
    val upsHi = urlsHi / secHi
    val eff = (upsHi / upsLo) / (hiCores.toDouble / loCores)

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val errJson = errors.map(e => s""""$e"""").mkString("[", ",", "]")
    println(
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"query_errors":$errJson,"sf":"$sfDir","crawl":{"rounds":$crawlRounds,"urls_lo":$urlsLo,"sec_lo":$secLo%.2f,"ups_lo":$upsLo%.1f,"cores_lo":$loCores,"cpu_lo":$cpuLo%.1f,"urls_hi":$urlsHi,"sec_hi":$secHi%.2f,"ups_hi":$upsHi%.1f,"cores_hi":$hiCores,"cpu_hi":$cpuHi%.1f,"scaling_efficiency":$eff%.3f}}""")
  }
}
