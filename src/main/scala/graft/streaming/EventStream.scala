package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the crawl engine's batch rounds stay batch
  * (deterministic + resumable, per the north rule), but the engine also
  * exposes streaming equivalents of its aggregation shapes for continuous
  * sources — watermarked tumbling windows and a stateful per-key politeness
  * gate via mapGroupsWithState (the streaming twin of the scheduler's
  * next_fetch clock, ≙ P3/P4 of SURVEY.md §2.5).
  */
object EventStream {

  /** Watermarked tumbling-window counts per event type — the streaming form
    * of SparkEntry's q_events_tumbling. */
  def tumblingCounts(events: DataFrame, windowLen: String = "10 minutes",
                     watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  final case class Request(host: String, ts: Long)
  final case class GateDecision(host: String, ts: Long, admitted: Boolean, nextAllowed: Long)

  /** Stateful politeness gate: per host, admit a request only if at least
    * `delayMs` has passed since the last admitted one (state = next_fetch
    * clock, exactly the host_state column of the batch scheduler). */
  def politenessGate(requests: Dataset[Request], delayMs: Long): Dataset[GateDecision] = {
    import requests.sparkSession.implicits._
    requests.groupByKey(_.host).mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
      (host: String, rows: Iterator[Request], state: GroupState[Long]) =>
        var nextAllowed = state.getOption.getOrElse(0L)
        var admitted = 0
        var lastTs = 0L
        // deterministic order within the micro-batch
        rows.toSeq.sortBy(_.ts).foreach { r =>
          lastTs = r.ts
          if (r.ts >= nextAllowed) { admitted += 1; nextAllowed = r.ts + delayMs }
        }
        state.update(nextAllowed)
        GateDecision(host, lastTs, admitted > 0, nextAllowed)
    }
  }

  /** Drive a streaming query from a bounded input synchronously (test/local
    * harness): memory sink, processAllAvailable. */
  def runToMemory(spark: SparkSession, streaming: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Update()): DataFrame = {
    val q = streaming.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
