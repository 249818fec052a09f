package graft
import org.apache.spark.sql.SparkSession
import graft.plans.CrawlDriver
import graft.sources.SynthWeb

/** Crawl scaling probe: same workload as Bench part 2, one level per run. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val hosts = if (args.length > 1) args(1).toInt else 40000
    val rounds = if (args.length > 2) args(2).toInt else 3
    val batch = if (args.length > 3) args(3).toInt else 16
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // reliable-checkpoint hygiene (ADVICE r5): without this, Dedup's
      // materialize() leaves its checkpoint data behind forever when a
      // checkpoint dir is configured
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_PROFILE")) {
      import org.apache.spark.scheduler._
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit =
          println(s"[jobiv start ${e.jobId} ${System.currentTimeMillis}]")
        override def onJobEnd(e: SparkListenerJobEnd): Unit =
          println(s"[jobiv end ${e.jobId} ${System.currentTimeMillis}]")
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val secs = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          val run = si.taskMetrics.executorRunTime / 1e3
          if (secs > 0.5)
            println(f"[stage ${si.stageId}%4d] wall=$secs%6.2fs cpu=$cpu%6.1fs run=$run%6.1fs tasks=${si.numTasks}%4d ${si.details.linesIterator.toSeq.drop(1).headOption.getOrElse("")}")
        }
      })
    }
    val cfg = CrawlConfig(numHosts = hosts, pagesPerHost = 200, outDegree = 20,
      corpusSize = 4096, imageSize = 32, keepAliveBatch = batch,
      verifySample = 1, numBuckets = 64, maxUrlsPerHost = 500)
    val web = new SynthWeb(cfg)
    val dir = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_WORKBASE", "/tmp")), s"graft_probe_$cores").toString
    // try/finally: a leaked probe workdir is ~0.5-5 GB; accumulated leaks
    // filled the disk in round 2 and crashed the official bench
    try {
      val d = new CrawlDriver(spark, cfg, dir)
      val m = d.run(web.seedsDf(spark, hosts.toLong * batch), maxRounds = rounds, maxUrls = Long.MaxValue)
      m.foreach(x => println(s"""{"round":${x.round},"deq":${x.dequeued},"wall_ms":${x.wall_ms}}"""))
      val urls = m.map(_.dequeued).sum; val sec = m.map(_.wall_ms).sum / 1e3
      println(f"""{"cores":$cores,"urls":$urls,"round_sec":$sec%.1f,"ups":${urls / sec}%.1f}""")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      spark.stop()
    }
  }
}
