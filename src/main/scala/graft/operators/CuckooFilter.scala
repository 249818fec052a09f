package graft.operators

import graft.functions.Hashing

/** A compact cuckoo filter over 64-bit keys (north rule: "partitioned
  * cuckoo-filter (with bloom fallback) URL-seen set").
  *
  * Classic construction (Fan et al., CoNEXT'14 — public algorithm):
  * 16-bit fingerprints, 4 slots per bucket, partial-key cuckoo kicking.
  * Buckets are derivable from (index, fingerprint) alone, so two filters of
  * equal size merge by re-inserting fingerprints — which makes it usable as
  * a per-partition pre-filter merged on the driver (SeenSet.prefilter).
  *
  * This replaces the reference's disk-backed Mercator sieve store front-end
  * (`/root/reference/src/clj/ramper/sieve/mercator_sieve.clj:45-142`) as the
  * approximate membership layer; exactness still comes from the anti-join.
  */
final class CuckooFilter(val numBuckets: Int) extends Serializable {
  require((numBuckets & (numBuckets - 1)) == 0, "numBuckets must be a power of 2")
  private val SlotsPerBucket = 4
  private[operators] val table = new Array[Short](numBuckets * SlotsPerBucket)
  private var count = 0L

  @inline private def fingerprint(key: Long): Short = {
    val f = (Hashing.splitmix64(key) & 0xFFFF).toInt
    (if (f == 0) 1 else f).toShort // 0 marks an empty slot
  }
  @inline private def bucket1(key: Long): Int =
    (Hashing.splitmix64(key ^ 0x5bd1e995L) & (numBuckets - 1)).toInt
  @inline private def altBucket(i: Int, f: Short): Int =
    (i ^ (Hashing.splitmix64(f.toLong & 0xFFFFL) & (numBuckets - 1)).toInt) & (numBuckets - 1)

  private def tryInsertAt(i: Int, f: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(i * SlotsPerBucket + s) == 0) { table(i * SlotsPerBucket + s) = f; return true }
      s += 1
    }
    false
  }

  /** Insert a fingerprint known to live at bucket i1 (or its alt). Used by
    * both add() and merge. Returns false when the filter is saturated — the
    * caller must then treat membership as "maybe" (fail-safe: overflowed
    * filters answer true). */
  def insertFingerprint(i1: Int, f0: Short): Boolean = {
    val i2 = altBucket(i1, f0)
    if (tryInsertAt(i1, f0) || tryInsertAt(i2, f0)) { count += 1; return true }
    // cuckoo kicking
    var i = if ((Hashing.splitmix64(f0.toLong ^ i1.toLong) & 1L) == 0L) i1 else i2
    var f = f0
    var kicks = 0
    while (kicks < 500) {
      val slot = (Hashing.splitmix64(f.toLong ^ i.toLong ^ kicks.toLong) & (SlotsPerBucket - 1)).toInt
      val evicted = table(i * SlotsPerBucket + slot)
      table(i * SlotsPerBucket + slot) = f
      f = evicted
      i = altBucket(i, f)
      if (tryInsertAt(i, f)) { count += 1; return true }
      kicks += 1
    }
    overflowed = true
    false
  }

  var overflowed: Boolean = false

  def add(key: Long): Boolean = insertFingerprint(bucket1(key), fingerprint(key))

  def mightContain(key: Long): Boolean = {
    if (overflowed) return true
    val f = fingerprint(key)
    val i1 = bucket1(key)
    val i2 = altBucket(i1, f)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(i1 * SlotsPerBucket + s) == f || table(i2 * SlotsPerBucket + s) == f) return true
      s += 1
    }
    false
  }

  /** Merge another same-size filter by re-inserting its fingerprints. */
  def mergeFrom(other: CuckooFilter): Unit = {
    require(other.numBuckets == numBuckets, "cuckoo merge: size mismatch")
    if (other.overflowed) overflowed = true
    var i = 0
    while (i < other.table.length) {
      val f = other.table(i)
      if (f != 0) insertFingerprint(i / SlotsPerBucket, f)
      i += 1
    }
  }

  def size: Long = count
}

object CuckooFilter {
  /** Size for n keys at ~95% load (4 slots/bucket). */
  def forCapacity(n: Long): CuckooFilter = {
    var buckets = 1
    while (buckets.toLong * 4 * 95 / 100 < n && buckets < (1 << 28)) buckets <<= 1
    new CuckooFilter(buckets)
  }

  /** Wire format: [numBuckets:int][overflowed:byte][table:short*]. */
  def toBytes(f: CuckooFilter): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 1 + f.table.length * 2)
    bb.putInt(f.numBuckets)
    bb.put(if (f.overflowed) 1.toByte else 0.toByte)
    f.table.foreach(bb.putShort)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val f = new CuckooFilter(bb.getInt)
    f.overflowed = bb.get() == 1
    var i = 0
    while (bb.remaining() >= 2) { f.table(i) = bb.getShort; i += 1 }
    f
  }
}
