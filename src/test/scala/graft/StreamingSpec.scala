package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming surfaces driven synchronously from bounded parquet input. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming tumbling counts match the batch aggregation") {
    // file streaming source requires a directory of files
    val srcDir = java.nio.file.Paths.get(TestSpark.tempDir("stream_in"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      srcDir.resolve("events.parquet"))
    val batchDf = spark.read.parquet(srcDir.toString)
    val stream = spark.readStream.schema(batchDf.schema).parquet(srcDir.toString)
    val got = EventStream.runToMemory(spark,
        EventStream.tumblingCounts(stream), "tumbling_test", OutputMode.Update())
      .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = batchDf
      .groupBy(window(col("ts").cast("timestamp"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("stateful politeness gate enforces per-host delay across micro-batches") {
    val reqs = Seq(
      EventStream.Request("a.test", 0L), EventStream.Request("a.test", 1000L),
      EventStream.Request("a.test", 2500L), EventStream.Request("b.test", 0L))
      .toDS()
    // batch harness for the same logic: one micro-batch via groupByKey
    val out = EventStream.politenessGate(reqs, delayMs = 2000L).collect()
    val a = out.find(_.host == "a.test").get
    // within one batch: admitted at 0, blocked at 1000, admitted at 2500
    assert(a.admitted && a.nextAllowed == 4500L)
    val b = out.find(_.host == "b.test").get
    assert(b.admitted && b.nextAllowed == 2000L)
  }
}
