package graft
import graft.sources.SynthWeb
import org.apache.spark.sql.SparkSession
object CorpusBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0)
    val n = if (args.length > 1) args(1).toInt else 50000
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = CrawlConfig(corpusSize = n, imageSize = 32)
    val t0 = System.nanoTime()
    val cnt = SynthWeb.corpus(spark, cfg).rdd.map(_.bytes.length.toLong).sum()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"n":$n,"bytes":$cnt,"sec":$sec%.2f,"cores":"$cores"}""")
    spark.stop()
  }
}
