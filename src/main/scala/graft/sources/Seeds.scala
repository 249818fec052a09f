package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seed list IO (S1/S2 — ≙ `/root/reference/src/clj/ramper/
  * startup_configuration.clj:10-39`): one URL per line, blank lines and
  * '#' comments skipped. The returned frame has one `url` column, the shape
  * CrawlDriver.run consumes directly.
  */
object Seeds {

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .toDF("url")
  }

  def write(df: DataFrame, path: String): Unit =
    df.select("url").coalesce(1).write.mode("overwrite").text(path)
}
