package graft

import graft.plans.CrawlDriver
import graft.sources.SynthWeb
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end crawl invariants (SURVEY.md §5 rebuild test plan):
  *  - sieve: "once and once only" — seen set unique, no page fetched twice
  *  - politeness: per-host fetch gaps >= crawl delay; one host per IP per round
  *  - robots: no disallowed path fetched
  *  - payload: caption exactly equals corpus caption (input_hint)
  *  - determinism + resume: a kill-and-resume run is identical to a straight run
  */
class CrawlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cfg = CrawlConfig(
    numHosts = 24, pagesPerHost = 32, outDegree = 6,
    corpusSize = 64, imageSize = 16, numBuckets = 8,
    keepAliveBatch = 3, maxUrlsPerHost = 40,
    brokenHostFraction = 0.1)

  private def freshDir(): String =
    TestSpark.tempDir("crawl_spec")

  test("3-round crawl: core invariants hold") {
    val dir = freshDir()
    val web = new SynthWeb(cfg)
    val driver = new CrawlDriver(spark, cfg, dir)
    val metrics = driver.run(web.seeds(6), maxRounds = 3, maxUrls = Long.MaxValue)
    assert(metrics.nonEmpty && metrics.head.fetched_ok > 0, "no pages fetched")
    val round = driver.latestRound().get
    val pages = driver.pages(round).cache()
    val seen = driver.seen(round).cache()

    // sieve invariant
    assert(seen.count() == seen.select("url_hash").distinct().count(), "seen has dups")
    assert(pages.count() == pages.select("url_hash").distinct().count(), "page fetched twice")

    // every page's caption matches its corpus row exactly (input_hint)
    val mismatches = pages.withColumn("pick", pmod(col("url_hash"), lit(cfg.corpusSize.toLong)))
      .withColumn("expected_id", format_string("img%09d", col("pick")))
      .filter(col("image_id") =!= col("expected_id"))
      .count()
    assert(mismatches == 0, "page payload does not match corpus assignment")
    val capOk = pages.select("caption").collect().forall(_.getString(0).startsWith("caption "))
    assert(capOk)

    // robots: no disallowed URL fetched (hosts i%5==0 disallow /private)
    val robotViolations = pages
      .filter(expr("cast(substring(host, 6, 6) as int) % 5 = 0"))
      .filter(col("url").contains("/private"))
      .count()
    assert(robotViolations == 0, "robots disallow violated")

    // host politeness: consecutive fetch rounds of one host spaced >= delay
    val gaps = pages.groupBy("host", "fetch_ts").count()
      .groupBy("host").agg(collect_list("fetch_ts").as("ts"))
      .collect()
    val hostDelays = pages.select("host").distinct().collect()
      .map(r => r.getString(0) -> web.robots(r.getString(0)).crawl_delay_ms).toMap
    gaps.foreach { r =>
      val host = r.getString(0)
      val ts = r.getSeq[Long](1).sorted
      ts.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b - a >= hostDelays(host), s"host $host politeness gap ${b - a}")
        case _ => ()
      }
    }

    // ip politeness: at most one host fetched per ip per round
    val ipHost = pages.select("host", "fetch_ts").distinct().collect()
      .map(r => (web.resolveIp(r.getString(0)), r.getLong(1), r.getString(0)))
    val byIpRound = ipHost.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).distinct.size)
    byIpRound.foreach { case ((ip, ts), nHosts) =>
      assert(nHosts == 1, s"ip $ip fetched $nHosts hosts at ts $ts")
    }
    pages.unpersist(); seen.unpersist()
  }

  test("determinism: two independent runs produce identical pages and seen set") {
    val web = new SynthWeb(cfg)
    def runFull(dir: String): (Seq[(Long, Long)], Seq[Long]) = {
      val d = new CrawlDriver(spark, cfg, dir)
      d.run(web.seeds(4), maxRounds = 4, maxUrls = Long.MaxValue)
      val r = d.latestRound().get
      val p = d.pages(r).select("url_hash", "phash").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val s = d.seen(r).select("url_hash").collect().map(_.getLong(0)).toSeq.sorted
      (p, s)
    }
    val (p1, s1) = runFull(freshDir())
    val (p2, s2) = runFull(freshDir())
    assert(p1 == p2, "pages differ between identical runs")
    assert(s1 == s2, "seen set differs between identical runs")
  }

  test("resume: kill after round 2, resume, outputs identical to straight run") {
    val web = new SynthWeb(cfg)
    val dirA = freshDir(); val dirB = freshDir()
    val straight = new CrawlDriver(spark, cfg, dirA)
    straight.run(web.seeds(4), maxRounds = 5, maxUrls = Long.MaxValue)

    val first = new CrawlDriver(spark, cfg, dirB)
    first.run(web.seeds(4), maxRounds = 2, maxUrls = Long.MaxValue)
    val resumed = new CrawlDriver(spark, cfg, dirB) // fresh driver = process restart
    resumed.run(web.seeds(4), maxRounds = 3, maxUrls = Long.MaxValue)

    def fingerprint(d: CrawlDriver): Seq[(Long, Long, Int)] = {
      val r = d.latestRound().get
      d.pages(r).select("url_hash", "phash", "round").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSeq.sorted
    }
    assert(straight.latestRound() == resumed.latestRound())
    assert(fingerprint(straight) == fingerprint(resumed), "resume broke bit-identity")
  }

  test("fetchSaltParts > 1 changes only the physical layout: outputs bit-identical") {
    val web = new SynthWeb(cfg)
    def runFull(c: CrawlConfig): (Seq[(Long, Long)], Seq[Long]) = {
      val d = new CrawlDriver(spark, c, freshDir())
      d.run(web.seeds(4), maxRounds = 4, maxUrls = Long.MaxValue)
      val r = d.latestRound().get
      (d.pages(r).select("url_hash", "phash").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted,
        d.seen(r).select("url_hash").collect().map(_.getLong(0)).toSeq.sorted)
    }
    val (p1, s1) = runFull(cfg)
    val (p4, s4) = runFull(cfg.copy(fetchSaltParts = 4))
    assert(p1 == p4, "fetch salt changed the pages output")
    assert(s1 == s4, "fetch salt changed the seen set")
    // stateStorage picks only the checkpoint block storage level (ser/disk
    // bound the heap for 2x-size bench rounds) — never values
    val (pd, sd) = runFull(cfg.copy(stateStorage = "disk", fetchSaltParts = 4))
    assert(p1 == pd, "disk state storage changed the pages output")
    assert(s1 == sd, "disk state storage changed the seen set")
  }

  test("state-format trust gate: resume recomputes fb from an old-format workdir") {
    // Simulate a workdir written by pre-format-2 code whose stored fb has
    // DIFFERENT semantics (ADVICE r4: trusting it silently starves eligible
    // hosts): corrupt fb in the committed anchor snapshots, strip
    // state_format from every manifest, then resume — the gate must
    // recompute fb from the host, making the resumed run bit-identical to a
    // straight run. Remove the gate and this test fails (the corrupt fb
    // prunes the wrong bucket directories).
    val cfgA = cfg.copy(reanchorEvery = 2)
    val web = new SynthWeb(cfgA)
    val dirA = freshDir(); val dirB = freshDir()
    val straight = new CrawlDriver(spark, cfgA, dirA)
    straight.run(web.seeds(4), maxRounds = 5, maxUrls = Long.MaxValue)

    val first = new CrawlDriver(spark, cfgA, dirB)
    first.run(web.seeds(4), maxRounds = 3, maxUrls = Long.MaxValue)
    // corrupt every frontier snapshot's fb (rotate buckets) and rewrite it
    // with the same at-rest layout, then strip the manifests' state_format
    val fDir = java.nio.file.Paths.get(dirB, "frontier")
    val snaps = Files.list(fDir).iterator()
    Iterator.continually(snaps).takeWhile(_.hasNext).map(_.next())
      .filter(_.getFileName.toString.startsWith("r=")).toSeq.foreach { p =>
        val rows = spark.read.parquet(p.toString)
          .withColumn("fb", pmod(col("fb").cast("int") + lit(3), lit(cfgA.numBuckets)))
        val tmp = p.getParent.resolve(p.getFileName.toString + ".tmp")
        rows.repartition(cfgA.numBuckets, col("fb"))
          .write.mode("overwrite").partitionBy("fb").parquet(tmp.toString)
        org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
        Files.move(tmp, p)
      }
    val mans = Files.list(java.nio.file.Paths.get(dirB)).iterator()
    Iterator.continually(mans).takeWhile(_.hasNext).map(_.next())
      .filter(_.getFileName.toString.startsWith("manifest_r")).toSeq.foreach { m =>
        val js = new String(Files.readAllBytes(m), java.nio.charset.StandardCharsets.UTF_8)
          .replaceAll(""""state_format":\s*\d+,\s*""", "")
        Files.write(m, js.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }

    val resumed = new CrawlDriver(spark, cfgA, dirB)
    resumed.run(web.seeds(4), maxRounds = 2, maxUrls = Long.MaxValue)
    def fp(d: CrawlDriver): (Seq[(Long, Int)], Seq[Long]) = {
      val r = d.latestRound().get
      (d.pages(r).select("url_hash", "round").collect()
        .map(x => (x.getLong(0), x.getInt(1))).toSeq.sorted,
        d.seen(r).select("url_hash").collect().map(_.getLong(0)).toSeq.sorted)
    }
    assert(straight.latestRound() == resumed.latestRound())
    assert(fp(straight) == fp(resumed),
      "old-format fb was trusted — resume diverged from the straight run")
  }

  test("resume across anchors + compaction stays bit-identical (reanchorEvery=2)") {
    // anchors at rounds 2 and 4 write snapshots AND compact seen/phash_seen;
    // resume from a non-anchor round (3) must compose snapshot+deltas exactly
    val cfgA = cfg.copy(reanchorEvery = 2)
    val web = new SynthWeb(cfgA)
    val dirA = freshDir(); val dirB = freshDir()
    val straight = new CrawlDriver(spark, cfgA, dirA)
    straight.run(web.seeds(4), maxRounds = 5, maxUrls = Long.MaxValue)
    val first = new CrawlDriver(spark, cfgA, dirB)
    first.run(web.seeds(4), maxRounds = 3, maxUrls = Long.MaxValue)
    val resumed = new CrawlDriver(spark, cfgA, dirB)
    resumed.run(web.seeds(4), maxRounds = 2, maxUrls = Long.MaxValue)
    def fp(d: CrawlDriver): (Seq[(Long, Int)], Seq[Long], Long) = {
      val r = d.latestRound().get
      (d.pages(r).select("url_hash", "round").collect()
        .map(x => (x.getLong(0), x.getInt(1))).toSeq.sorted,
        d.seen(r).select("url_hash").collect().map(_.getLong(0)).toSeq.sorted,
        d.frontier(r).count())
    }
    assert(straight.latestRound() == resumed.latestRound())
    assert(fp(straight) == fp(resumed), "resume across compaction broke bit-identity")
  }

  test("anchor frontier snapshots are bucket-partitioned at rest") {
    val cfgA = cfg.copy(reanchorEvery = 2)
    val web = new SynthWeb(cfgA)
    val dir = freshDir()
    val d = new CrawlDriver(spark, cfgA, dir)
    d.run(web.seeds(6), maxRounds = 2, maxUrls = Long.MaxValue)
    // bootstrap (r=0) and the anchor (r=2) write fb=host-bucket dirs
    for (r <- Seq(0, 2)) {
      val snap = java.nio.file.Paths.get(dir, "frontier", s"r=$r")
      val parts = Files.list(snap).iterator()
      val fbDirs = Iterator.continually(parts).takeWhile(_.hasNext).map(_.next())
        .map(_.getFileName.toString).filter(_.startsWith("fb=")).toSeq
      assert(fbDirs.nonEmpty, s"frontier r=$r not bucket-partitioned")
      assert(fbDirs.forall(s => s.stripPrefix("fb=").toInt < cfgA.numBuckets))
    }
    // the at-rest bucket column never leaks into the logical schema
    assert(!d.frontier(2).columns.contains("fb"))
  }

  test("cold-bucket pruning: dequeue reads <20% of frontier partitions, bit-identical") {
    import graft.operators.Scheduler
    import graft.plans.CrawlRound
    import graft.sources.TableIO
    import spark.implicits._
    // 200 hosts over 128 buckets; ~94% of hosts cold (far-future next_fetch)
    val cfgP = CrawlConfig(numHosts = 200, pagesPerHost = 8, outDegree = 4,
      corpusSize = 64, imageSize = 16, numBuckets = 128, keepAliveBatch = 3)
    val web = new SynthWeb(cfgP)
    val st = CrawlRound.bootstrap(spark, web, cfgP, web.seeds(200).toDF("url"))
    val hostCold = st.hostState.withColumn("next_fetch",
      when(pmod(xxhash64(col("host")), lit(16)) =!= 0, lit(1000000000L))
        .otherwise(lit(0L)))
      .localCheckpoint()
    // the at-rest case: frontier read back from its bucketed snapshot, fb
    // as the partition column — the 10^10-row shape where pruning must
    // skip bucket directories, not just filter rows
    val dir = freshDir()
    val io = new TableIO(dir, spark)
    io.writeBucketed("frontier", 0, st.frontier, "fb", cfgP.numBuckets)
    val front = io.readSnapshot("frontier", 0)

    val elig = Scheduler.eligibleBuckets(hostCold, 0L, cfgP)
    assert(elig.isDefined, "eligibility summary found no cold buckets to prune")
    assert(elig.get.length * 5 < cfgP.numBuckets,
      s"${elig.get.length} of ${cfgP.numBuckets} buckets eligible — not a cold frontier")

    def inputBytes(action: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            acc.addAndGet(e.taskMetrics.inputMetrics.bytesRead): Unit
      }
      spark.sparkContext.addSparkListener(l)
      try { action; org.apache.spark.GraftTestHooks.drainListenerBus(spark.sparkContext) }
      finally spark.sparkContext.removeSparkListener(l)
      acc.get()
    }

    var resFull: Array[org.apache.spark.sql.Row] = null
    var resPruned: Array[org.apache.spark.sql.Row] = null
    val bytesFull = inputBytes {
      resFull = Scheduler.dequeue(front, hostCold, st.ipState, 0L, cfgP,
        broadcastDims = true).collect()
    }
    val bytesPruned = inputBytes {
      resPruned = Scheduler.dequeue(front, hostCold, st.ipState, 0L, cfgP,
        broadcastDims = true, eligibleBuckets = elig).collect()
    }
    // bit-identical dequeue
    assert(resPruned.map(_.toString).sorted.sameElements(resFull.map(_.toString).sorted),
      "pruned dequeue chose different rows")
    assert(resFull.nonEmpty, "dequeue chose nothing — test shape broken")
    // the pruned scan touched <20% of the frontier's bucket partitions
    assert(bytesFull > 0 && bytesPruned * 5 < bytesFull,
      s"pruned scan read $bytesPruned of $bytesFull input bytes (want <20%)")
  }

  test("error policy: killer classes purge the host, transient classes drop URLs") {
    val cfgB = cfg.copy(brokenHostFraction = 1.0, numHosts = 12, maxRetries = 2)
    val web = new SynthWeb(cfgB)
    val d = new CrawlDriver(spark, cfgB, freshDir())
    val m = d.run(web.seeds(12), maxRounds = 60, maxUrls = Long.MaxValue)
    assert(m.nonEmpty)
    val r = d.latestRound().get
    assert(d.pages(r).count() == 0, "broken hosts must never yield pages")
    // seeds(12) = page 0 of each host = /private/page/0, which hosts i%5==0
    // disallow — those three are never fetched and legitimately stay live.
    val fetchable = (0 until 12).filterNot(_ % 5 == 0).map(web.hostName).toSet
    assert(m.map(_.fetch_errors).sum > 0, "broken hosts should error")
    val hosts = d.hostState(r)
      .select("host", "status", "retries").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    fetchable.foreach { h =>
      val killer = graft.operators.Fetch.errorPolicies(web.errorClass(h)).killer
      if (killer)
        assert(hosts(h) == "dead", s"$h (killer ${web.errorClass(h)}) should be purged")
      else
        assert(hosts(h) == "live", s"$h (transient ${web.errorClass(h)}) should survive via URL drop")
    }
    assert(hosts.values.count(_ == "dead") > 0, "no killer class drawn — pick a richer host set")
    // in both branches the frontier must fully drain (purged or dropped)
    assert(d.frontier(r).count() == 0, "frontier not drained")
  }

  test("path-query-limit bounds the per-host refill below the keepalive batch") {
    // crawl-delay term: 300000/crawl_delay_ms — a huge host delay forces the
    // P6 cutoff under the keepalive batch (workbench.clj:209-223)
    val cfgP = cfg.copy(hostDelayMs = 150000L, roundTickMs = 300000L,
      keepAliveBatch = 8, numHosts = 3, brokenHostFraction = 0.0)
    val web = new SynthWeb(cfgP)
    val d = new CrawlDriver(spark, cfgP, freshDir())
    // hosts with i%7==0 double their delay to 300000 -> byDelay = 1
    val metricsRun = d.run(web.seeds(24), maxRounds = 1, maxUrls = Long.MaxValue)
    val r = d.latestRound().get
    val perHost = d.pages(r).groupBy("host").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    perHost.foreach { case (h, n) =>
      val delay = web.robots(h).crawl_delay_ms
      val limit = math.max(1L, math.min(cfgP.keepAliveBatch.toLong, 300000L / delay))
      assert(n <= limit, s"$h fetched $n > path-query-limit $limit (delay $delay)")
    }
    assert(perHost.values.exists(_ < cfgP.keepAliveBatch),
      "P6 cutoff never engaged — test config too loose")
    assert(metricsRun.nonEmpty)
  }

  test("cookies: jar populated on fetch, capped by byte budget") {
    val d = new CrawlDriver(spark, cfg, freshDir())
    val web = new SynthWeb(cfg)
    d.run(web.seeds(6), maxRounds = 2, maxUrls = Long.MaxValue)
    val hosts = d.hostState(d.latestRound().get)
    val withCookies = hosts.filter(size(map_keys(col("cookies"))) > 0)
      .select("host", "cookies").collect()
    assert(withCookies.nonEmpty, "no host accumulated cookies after OK fetches")
    withCookies.foreach { row =>
      val m = row.getMap[String, String](1)
      val bytes = m.map { case (k, v) => k.length + v.length + 1 }.sum
      assert(bytes <= cfg.cookieMaxBytes, "cookie jar exceeds byte budget")
      assert(m.keys.toSeq.contains("sid"))
    }
  }

  test("cookie replay: a valid presented session token changes the response") {
    // request with no/invalid sid -> server issues Set-Cookie; request
    // replaying the jar's valid sid -> no Set-Cookie (session round-trip,
    // ≙ fetching_thread.clj:209-225 clear+re-add before each fetch)
    import spark.implicits._
    val web = new SynthWeb(cfg)
    val corpus = SynthWeb.corpus(spark, cfg).toDF()
      .withColumn(
        "corpus_idx", expr("cast(substring(image_id, 4, 9) as long)"))
    val host = web.hostName(1)
    val validSid = java.lang.Long.toHexString(
      // Catalyst hex() emits uppercase
      functions.Hashing.xxhash64(host)).toUpperCase
    def fetchWith(jar: Map[String, String]): Option[String] = {
      // find a url_hash that yields status 200 (not the 2% synthetic 404s)
      val u = (0 until 20).map(p => web.url(1, p.toLong))
        .find(u => web.httpStatus(functions.Hashing.xxhash64(u))== 200).get
      val dequeued = Seq((u, functions.Hashing.xxhash64(u), host, "/p", 1L, 0, 0,
        web.resolveIp(host), 0, false, 1000L, jar))
        .toDF("url", "url_hash", "host", "path_query", "seq_no", "priority",
          "round_added", "ip", "bucket", "broken", "crawl_delay_ms", "cookies")
      val r = graft.operators.Fetch.run(dequeued, corpus, web, cfg, 0L).collect().head
      Option(r.getAs[String]("set_cookie"))
    }
    val issued = fetchWith(Map.empty)
    assert(issued.contains(s"sid=$validSid"), s"no session issued: $issued")
    assert(fetchWith(Map("sid" -> validSid)).isEmpty,
      "server re-issued the session despite a valid replayed cookie")
    assert(fetchWith(Map("sid" -> "BOGUS")).contains(s"sid=$validSid"),
      "server must re-issue on an invalid session token")
  }

  test("dns ttl: stale entries re-resolve (resolved_at advances)") {
    val cfgD = cfg.copy(dnsTtlMs = 1L) // everything stale every round
    val web = new SynthWeb(cfgD)
    val d = new CrawlDriver(spark, cfgD, freshDir())
    d.run(web.seeds(6), maxRounds = 3, maxUrls = Long.MaxValue)
    val r = d.latestRound().get
    val hs = d.hostState(r)
    // every host re-resolved at the latest round's logical time
    val maxTs = r.toLong * cfgD.roundTickMs
    val stale = hs.filter(col("resolved_at") =!= maxTs).count()
    assert(stale == 0, s"$stale hosts kept stale DNS entries past the TTL")
    // the synthetic resolver is pure, so ips must be unchanged vs fresh resolve
    val bad = hs.collect().count(x =>
      x.getAs[Long]("ip") != web.resolveIp(x.getAs[String]("host")))
    assert(bad == 0)
  }

  test("host outcome aggregation is bit-stable when one host mixes error classes") {
    // the production fetch stage could legitimately yield DIFFERENT error
    // classes for one host in one round; the host-outcome aggregate must be
    // a pure function of the row SET, not of partitioning or arrival order
    // (first() after groupBy silently breaks this — VERDICT r2 #3)
    import spark.implicits._
    val rows = Seq( // (host, url_hash, status, error, set_cookie)
      ("h1", 30L, -1, "socket_timeout", null.asInstanceOf[String]),
      ("h1", 10L, -1, "connect_timeout", null.asInstanceOf[String]),
      ("h1", 20L, -1, "socket_error", null.asInstanceOf[String]),
      ("h1", 5L, 200, null.asInstanceOf[String], "sid=AA"),
      ("h1", 7L, 200, null.asInstanceOf[String], "sid=BB"),
      ("h2", 1L, -1, "unknown_host", null.asInstanceOf[String]))
    def outcome(shuffled: Seq[(String, Long, Int, String, String)], parts: Int) =
      shuffled.toDF("host", "url_hash", "status", "error", "set_cookie")
        .repartition(parts)
        .groupBy(col("host")).agg(
          min_by(col("error"), when(col("error").isNotNull, col("url_hash"))).as("err"),
          min_by(col("set_cookie"),
            when(col("set_cookie").isNotNull, col("url_hash"))).as("cookie_hdr"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSeq.sortBy(_._1)
    val a = outcome(rows, 1)
    val b = outcome(rows.reverse, 4)
    val c = outcome(scala.util.Random.shuffle(rows), 3)
    assert(a == b && b == c, "host outcome depends on row order/partitioning")
    // total-order choice: the url_hash-smallest error / cookie row wins
    assert(a == Seq(("h1", "connect_timeout", "sid=AA"), ("h2", "unknown_host", null)))
  }

  test("external stop: a STOP file in the workDir halts the round loop") {
    val dir = freshDir()
    val web = new SynthWeb(cfg)
    val d = new CrawlDriver(spark, cfg, dir)
    d.run(web.seeds(4), maxRounds = 2, maxUrls = Long.MaxValue)
    assert(d.latestRound().get == 2)
    Files.createFile(java.nio.file.Paths.get(dir, "STOP"))
    val resumed = new CrawlDriver(spark, cfg, dir)
    val m = resumed.run(web.seeds(4), maxRounds = 10, maxUrls = Long.MaxValue)
    assert(m.isEmpty && resumed.latestRound().get == 2, "STOP file ignored")
  }
}
