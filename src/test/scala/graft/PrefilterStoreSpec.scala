package graft

import graft.operators.PrefilterStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Partitioned cuckoo prefilter store (north rule): distributed build at 10^7
  * keys with bounded per-bucket memory, zero false negatives, sane false
  * positives, incremental versioned updates. */
class PrefilterStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("10^7-key distributed build: no false negatives, bounded bucket files") {
    import spark.implicits._
    val n = 10000000L
    val dir = TestSpark.tempDir("prefilter")
    val store = new PrefilterStore(dir, numBuckets = 32,
      capacityPerBucket = (n / 32 * 11) / 10)
    // synthetic 64-bit keys spread over the full hash space
    def keys(from: Long, to: Long) =
      spark.range(from, to).select(xxhash64(col("id")).as("url_hash"))
    store.addDelta(keys(0, n))

    // per-bucket memory/file bound: each file sized for capacity, not total
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".cf")).toSeq
    assert(files.size == 32, s"expected 32 bucket files, got ${files.size}")
    val maxBytes = files.map(f => Files.size(f)).max
    assert(maxBytes < 3L * 1024 * 1024,
      s"bucket file $maxBytes B — per-bucket bound broken")

    // ZERO false negatives (the sieve's correctness precondition)
    val misses = keys(0, n).filter(!store.predicate(spark)).count()
    assert(misses == 0, s"$misses false negatives")

    // false positives on a disjoint key range stay low
    val fp = keys(n, n + 1000000L).filter(store.predicate(spark)).count()
    assert(fp < 30000, s"fp rate ${fp / 10000.0}% too high") // < 3%
  }

  test("incremental versioned updates; resume re-insertion is idempotent") {
    import spark.implicits._
    val dir = TestSpark.tempDir("prefilter_inc")
    val store = new PrefilterStore(dir, numBuckets = 4, capacityPerBucket = 10000)
    def keys(from: Long, to: Long) =
      spark.range(from, to).select(xxhash64(col("id")).as("url_hash"))
    store.addDelta(keys(0, 1000))
    store.addDelta(keys(1000, 2000))
    store.addDelta(keys(500, 1500)) // replay overlap (crash-resume path)
    assert(keys(0, 2000).filter(!store.predicate(spark)).count() == 0)
    // bounded live versions per bucket: the current one plus ONE delayed
    // predecessor (kept so an already-pinned version map still resolves);
    // older generations are garbage-collected
    val perBucket = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".cf")).toSeq
      .groupBy(_.takeWhile(_ != '_'))
    perBucket.foreach { case (b, fs) =>
      assert(fs.size <= 2, s"bucket $b grew stale versions: $fs")
    }
  }

  test("overflowed bucket degrades to maybe: zero false negatives at 2x capacity") {
    import spark.implicits._
    val dir = TestSpark.tempDir("prefilter_ovf")
    // tiny per-bucket capacity, then insert 2x that many keys per bucket
    val store = new PrefilterStore(dir, numBuckets = 4, capacityPerBucket = 512)
    def keys(from: Long, to: Long) =
      spark.range(from, to).select(xxhash64(col("id")).as("url_hash"))
    store.addDelta(keys(0, 4L * 512 * 2))
    // fail-safe contract: past capacity the filter may only LOSE pruning,
    // never report an inserted key as definitely-new
    val misses = keys(0, 4L * 512 * 2).filter(!store.predicate(spark)).count()
    assert(misses == 0, s"$misses false negatives after overflow")
    // and it really is degraded, not silently dropping inserts: a saturated
    // bucket answers maybe for everything (no pruning left there)
    val fpAll = keys(100000, 101000).filter(store.predicate(spark)).count()
    assert(fpAll > 0)
  }

  test("missing bucket file answers maybe instead of failing the task") {
    import spark.implicits._
    val dir = TestSpark.tempDir("prefilter_miss")
    val store = new PrefilterStore(dir, numBuckets = 2, capacityPerBucket = 4096)
    def keys(from: Long, to: Long) =
      spark.range(from, to).select(xxhash64(col("id")).as("url_hash"))
    store.addDelta(keys(0, 1000))
    val pred = store.predicate(spark) // pins current versions
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".cf"))
      .foreach(Files.delete)
    graft.operators.PrefilterStore.clearCache() // simulate a fresh executor
    val n = keys(0, 1000).filter(pred).count()
    assert(n == 1000, s"deleted bucket files must degrade to maybe, got $n/1000")
  }

  test("crawl with prefilter engaged from round 1 equals prefilterless crawl") {
    val base = CrawlConfig(numHosts = 16, pagesPerHost = 24, outDegree = 5,
      corpusSize = 32, imageSize = 16, numBuckets = 8, keepAliveBatch = 2,
      brokenHostFraction = 0.0)
    val web = new graft.sources.SynthWeb(base)
    def crawl(cfg: CrawlConfig): (Long, Seq[Long]) = {
      val d = new graft.plans.CrawlDriver(spark, cfg,
        TestSpark.tempDir("pf_crawl"))
      d.run(web.seeds(6), maxRounds = 3, maxUrls = Long.MaxValue)
      val r = d.latestRound().get
      (d.pages(r).count(),
        d.seen(r).select("url_hash").collect().map(_.getLong(0)).toSeq.sorted)
    }
    val (p1, s1) = crawl(base.copy(prefilterMinSeen = 0L))     // filter always on
    val (p2, s2) = crawl(base.copy(bloomPrefilter = false))    // filter never on
    assert(p1 == p2 && s1 == s2, "prefilter changed crawl results")
  }
}
