package graft.functions

/** Minimal open-addressing hash set of longs for partition-local dedup in
  * hot loops. Why not `java.util.HashSet[Long]`: boxing promotes one Long +
  * one Node per entry into old-gen for the lifetime of the task (measured as
  * a 3-6x jump in GC wall-time in the link stage); this keeps one flat
  * `long[]` per task. Zero marks an empty slot; a GENUINE zero key is
  * tracked by a dedicated flag — remapping it into the key space (round 2)
  * could alias two distinct keys and silently drop a row (ADVICE r2).
  *
  * Capacity is fixed at construction (power of two). Once ~70% full, `add`
  * stops inserting and reports every key as "new" — overflow degrades to
  * pass-through (the caller emits, the exact downstream dedup still holds)
  * instead of ever dropping a distinct key.
  */
private[graft] final class LongSet(capacityPow2: Int) {
  private[this] val mask = (1 << capacityPow2) - 1
  private[this] val slots = new Array[Long](1 << capacityPow2)
  private[this] var used = 0
  private[this] var hasZero = false
  private[this] val maxUsed = (slots.length * 0.7).toInt

  /** False only when `k` is known present; true = new (or set full). */
  def add(k: Long): Boolean = {
    if (k == 0L) {
      if (hasZero) return false
      hasZero = true; return true
    }
    if (used >= maxUsed) return true
    var i = (java.lang.Long.hashCode(k * 0x9E3779B97F4A7C15L)) & mask
    while (true) {
      val s = slots(i)
      if (s == k) return false
      if (s == 0L) { slots(i) = k; used += 1; return true }
      i = (i + 1) & mask
    }
    false
  }

  def size: Int = used + (if (hasZero) 1 else 0)
}
