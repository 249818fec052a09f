package graft

import graft.operators.{Cookies, Scheduler}
import org.scalatest.funsuite.AnyFunSuite

/** Pure scheduler arithmetic (P6, F3) and cookie truncation (G3). */
class SchedulerSpec extends AnyFunSuite {

  test("path-query-limit matches the BUbiNG formula shape") {
    // delay-bound: 300000/2000 = 150
    assert(Scheduler.pathQueryLimit(2000, 1L << 40, 100, 1) == 150)
    // memory-bound: tiny workbench forces the floor of 4
    assert(Scheduler.pathQueryLimit(1, 10, 100, 1000) == 4)
    // memory-bound above floor
    assert(Scheduler.pathQueryLimit(1, 1000000, 100, 10) == 1000)
  }

  test("adaptive batch grows when starved, capped, stable when saturated") {
    assert(Scheduler.adaptBatch(4, dequeued = 10, quota = 100) == 8)
    assert(Scheduler.adaptBatch(64, dequeued = 0, quota = 100) == 64)
    assert(Scheduler.adaptBatch(4, dequeued = 90, quota = 100) == 4)
    assert(Scheduler.adaptBatch(4, dequeued = 0, quota = 0) == 4)
  }

  test("cookie truncation keeps prefix within byte budget") {
    val cs = Seq("a" -> "1", "bb" -> "22", "ccc" -> "333")
    assert(Cookies.limitCookies(cs, 3) == Seq("a" -> "1"))
    assert(Cookies.limitCookies(cs, 8) == Seq("a" -> "1", "bb" -> "22"))
    assert(Cookies.limitCookies(cs, 100) == cs)
    assert(Cookies.limitCookies(Nil, 10) == Nil)
  }

  test("eligibleBuckets folds IP readiness: cold-IP buckets pruned, dequeue bit-identical") {
    // VERDICT r5 #5: a round throttled at the IP level must prune buckets
    // the host clock alone would keep scanning — and the pruning must not
    // change what dequeue returns.
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cfg = CrawlConfig(numBuckets = 64)
    def bucketOf(h: String): Int =
      graft.functions.Hashing.pmod(graft.functions.Hashing.xxhash64(h), 64L).toInt
    // two hosts in (almost surely) different buckets; both host-clock-ready
    val hReady = "ready-ip.test"    // ip A: ready
    val hCold = "cold-ip.test"      // ip B: next_fetch in the future
    assert(bucketOf(hReady) != bucketOf(hCold)) // fixture sanity
    val ts = 1000L
    val hostState = Seq(
      (hReady, "10.0.0.1", 0L, bucketOf(hReady), false, 0L, 0L,
        Seq.empty[String], 0, "", "live", 0L, Map.empty[String, String]),
      (hCold, "10.0.0.2", 0L, bucketOf(hCold), false, 0L, 0L,
        Seq.empty[String], 0, "", "live", 0L, Map.empty[String, String]))
      .toDF("host", "ip", "resolved_at", "bucket", "broken", "next_fetch",
        "crawl_delay_ms", "disallow", "retries", "last_error", "status",
        "enqueued_count", "cookies")
    val ipState = Seq(("10.0.0.1", 0L), ("10.0.0.2", ts + 999999L))
      .toDF("ip", "next_fetch")
    // host-only view keeps both buckets; the IP-folded view prunes cold-ip's
    val hostOnly = Scheduler.eligibleBuckets(hostState, ts, cfg).get
    val withIp = Scheduler.eligibleBuckets(hostState, ts, cfg, Some(ipState)).get
    assert(hostOnly.toSet == Set(bucketOf(hReady), bucketOf(hCold)))
    assert(withIp.toSet == Set(bucketOf(hReady)), "cold-IP bucket not pruned")
    // dequeue over a small frontier: pruned scan == unpruned scan, row for row
    val frontier = Seq(
      ("http://ready-ip.test/a", 11L, hReady, "/a", 1L, 0, 0),
      ("http://ready-ip.test/b", 12L, hReady, "/b", 2L, 0, 0),
      ("http://cold-ip.test/a", 21L, hCold, "/a", 1L, 0, 0))
      .toDF("url", "url_hash", "host", "path_query", "seq_no", "priority", "round_added")
    def rows(elig: Option[Array[Int]]) =
      Scheduler.dequeue(frontier, hostState, ipState, ts, cfg,
        eligibleBuckets = elig)
        .select("url", "url_hash", "host")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val unpruned = rows(None)
    assert(rows(Some(withIp)) == unpruned)
    assert(unpruned.forall(_.contains(hReady)), "cold-IP host must not dequeue")
    assert(unpruned.nonEmpty)
  }
}
