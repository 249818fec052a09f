package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (guide §1): NOT part of the frozen bench.
  *
  *   plans <sfDir> <outDir> <suffix>  — write every query's
  *       explain("formatted") to <outDir>/<name>_<suffix>.txt
  *   time <sfDir> [reps]              — per-query count() timings with the
  *       same session config + sf0.001 warm-up pass as graft.Bench's query
  *       child; prints min across reps as one JSON line
  *   noop <sfDir> [reps]              — same but timed through the noop sink
  *       (computes every column; isolates computation from count pruning)
  *
  * The frozen bench (graft.Bench) remains the only official record; numbers
  * from this main are cited in OPTIMIZATION_r06.md as before/after evidence.
  */
object BenchExtra {

  private def env(k: String, d: String) = sys.env.getOrElse(k, d)

  /** Mirror of Bench.session (private there; config kept identical so plan
    * shapes and timings are representative of the official child). */
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions",
        (cores * env("SPARK_GRAFT_BENCH_PARTS_PER_CORE", "2").toInt).toString)
      .config("spark.sql.adaptive.enabled", env("SPARK_GRAFT_BENCH_AQE", "1") == "1")
      .config("spark.scheduler.mode", env("SPARK_GRAFT_BENCH_SCHED", "FAIR"))
      .config("spark.scheduler.allocation.file", graft.plans.CrawlDriver.fairPoolsXml)
      .config("spark.locality.wait", env("SPARK_GRAFT_BENCH_LOCALITY_WAIT", "0s"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      // reliable-checkpoint hygiene (ADVICE r5): without this, Dedup's
      // materialize() leaves its checkpoint data behind forever when a
      // checkpoint dir is configured
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/tmp/spark_local_extra")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    if (sys.env.contains("SPARK_GRAFT_PROFILE")) {
      import org.apache.spark.scheduler._
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val secs = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          if (secs > 0.05)
            System.err.println(f"[stage ${si.stageId}%4d] $secs%6.2fs cpu=$cpu%6.1f tasks=${si.numTasks}%3d ${si.name.take(60)}")
        }
      })
    }
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    val only = sys.env.get("SPARK_GRAFT_EXTRA_ONLY")
      .map(_.split(",").toSet)
    def selected = only.map(o => qs.filter(t => o(t._1))).getOrElse(qs)

    // same session warm-up as the frozen bench child
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").limit(1).collect()
    catch { case _: Exception => () }
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && mode != "plans")
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Exception => () }
      }

    mode match {
      case "plans" =>
        val outDir = args(2); val suffix = args(3)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        selected.foreach { case (name, fn) =>
          val txt =
            try {
              val df = fn(spark, sfDir)
              // queryExecution.explainString gives the pre-execution plan
              df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
            } catch { case e: Exception => s"EXPLAIN FAILED: $e" }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          System.err.println(s"[plans] wrote $name")
        }
      case "time" | "noop" =>
        val reps = if (args.length > 2) args(2).toInt else 1
        val acc = scala.collection.mutable.Map.empty[String, List[Double]]
        for (_ <- 1 to reps; (name, fn) <- selected) {
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            if (mode == "noop") df.write.format("noop").mode("overwrite").save()
            else df.count()
            acc(name) = (System.nanoTime() - t0) / 1e9 :: acc.getOrElse(name, Nil)
          } catch {
            case e: Throwable =>
              System.err.println(s"[extra] $name FAILED: $e")
              acc(name) = -1.0 :: acc.getOrElse(name, Nil)
          }
        }
        val mins = acc.toSeq.sortBy(_._1).map { case (k, vs) => k -> vs.min }
        val total = mins.filter(_._2 >= 0).map(_._2).sum
        println(f"""{"mode":"$mode","total":$total%.2f,"queries":{""" +
          mins.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",") + "}}")
        System.err.println("[extra] all samples: " + acc.toSeq.sortBy(_._1)
          .map { case (k, vs) => s"$k=${vs.reverse.map(v => f"$v%.2f").mkString("/")}" }
          .mkString(" "))
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
