package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // reliable-checkpoint hygiene (ADVICE r5): without this, Dedup's
      // materialize() leaves its checkpoint data behind forever when a
      // checkpoint dir is configured
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** All suite workdirs live under one per-JVM root that a shutdown hook
    * deletes — a full `sbt test` writes gigabytes of crawl output, and
    * leaked dirs accumulate across runs until the disk fills (this exact
    * leak broke round 2's bench record with ENOSPC mid-shuffle). */
  private lazy val tempRoot: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_test_")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(r.toFile): Unit))
    r
  }

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(tempRoot, prefix).toString
}
