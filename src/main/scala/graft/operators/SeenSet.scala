package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The URL sieve, Spark-first (SURVEY.md §2.2).
  *
  * Semantics to preserve (`/root/reference/src/clj/ramper/sieve.clj:7-12`):
  * "every key enqueued is dequeued once and once only". The reference
  * implements this with a Mercator sieve — radix sort + two-pointer merge
  * against a sorted on-disk hash store (`mercator_sieve.clj:45-142`). The
  * algorithmic core IS a sort-merge anti-join, which Catalyst plans natively;
  * the in-bucket duplicate kill is an in-batch dedup; the LRU front-cache
  * (`frontier.clj:67-70`) is subsumed by exact in-batch dedup.
  *
  * Scale path (north rule): an approximate membership pre-filter (cuckoo,
  * bloom fallback) built per-partition over the seen table and broadcast,
  * so at 10^10 seen URLs the expensive exact anti-join shuffle only touches
  * the (tiny) fraction of candidates that *might* be duplicates; candidates
  * that miss the filter are definitely new and bypass the shuffle entirely.
  */
object SeenSet {

  /** In-batch dedup on the 64-bit key — keep one row per url_hash
    * (all rows of a hash carry the same canonical url). ≙ D5 + the
    * in-bucket invalidation of mercator_sieve.clj:63-113. */
  def dedupeBatch(candidates: DataFrame): DataFrame =
    candidates.dropDuplicates("url_hash")

  /** Exact anti-join against the seen table: survivors are new-once-ever. */
  def antiJoin(candidates: DataFrame, seen: DataFrame): DataFrame =
    candidates.join(seen.select("url_hash"), Seq("url_hash"), "left_anti")

  /** Build a broadcastable cuckoo pre-filter from the seen table via the
    * native [[CuckooFilterAgg]] TypedImperativeAggregate (partials built per
    * partition, merged in Catalyst's partial-aggregate tree). Falls back to
    * Spark's built-in BloomFilter sketch when the merged filter overflows.
    * Returns a Column predicate `mightContain(url_hash)`.
    */
  def prefilterPredicate(seen: DataFrame, expectedKeys: Long, fpp: Double): Column = {
    val spark = seen.sparkSession
    val capacity = math.max(1024L, expectedKeys)
    // the cuckoo aggregate allocates every per-task PARTIAL at full capacity
    // and ships whole tables between partials — fine for bounded in-session
    // filters, an OOM/shuffle hazard past ~8 MB per partial. Above that,
    // go straight to Spark's bloom sketch (exactly-sized partials); the
    // partitioned PrefilterStore is the engine's real path at 10^8+ keys.
    if (capacity > (1L << 22)) {
      val bloom = seen.stat.bloomFilter("url_hash", capacity, fpp)
      val bc = spark.sparkContext.broadcast(bloom)
      val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
      return mightContain(col("url_hash"))
    }
    val blob = seen.select(CuckooFilterAgg(col("url_hash"), capacity).as("f"))
      .head().getAs[Array[Byte]](0)
    val merged = CuckooFilter.fromBytes(blob)
    if (!merged.overflowed) {
      val bc = spark.sparkContext.broadcast(merged)
      val mightContain = udf((h: Long) => bc.value.mightContain(h))
      mightContain(col("url_hash"))
    } else {
      // bloom fallback: Spark's sketch aggregates natively over the Dataset
      val bloom = seen.stat.bloomFilter("url_hash", capacity * 2, fpp)
      val bc = spark.sparkContext.broadcast(bloom)
      val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
      mightContain(col("url_hash"))
    }
  }

  /** Full sieve pass: in-batch dedup, then (optionally) split candidates by
    * an approximate membership predicate — "definitely new" rows skip the
    * shuffle; only "maybe seen" rows pay the exact anti-join. The engine
    * passes the partitioned [[PrefilterStore]] predicate (incremental,
    * partition-local, no driver blob); `prefilterPredicate` above remains the
    * in-session alternative for bounded filters.
    */
  def sieve(candidates: DataFrame, seen: DataFrame,
            prefilter: Option[Column]): DataFrame = {
    val batch = dedupeBatch(candidates)
    prefilter match {
      case None => antiJoin(batch, seen)
      case Some(maybe) =>
        val definitelyNew = batch.filter(!maybe)
        val needExact = batch.filter(maybe)
        definitelyNew.unionByName(antiJoin(needExact, seen))
    }
  }
}
