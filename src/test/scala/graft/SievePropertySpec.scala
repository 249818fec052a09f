package graft

import graft.operators.SeenSet
import org.scalatest.funsuite.AnyFunSuite

/** Property: the sieve's output SET is invariant under input permutation
  * and duplication (≙ the reference invariant "enqueued-set == dequeued-set"
  * under 25 racing threads, mercator_sieve_test.clj:34-89 — our batch round
  * replaces thread races with arbitrary partition orders). */
class SievePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sieve set-equality under permutation, duplication, and partitioning") {
    val rnd = new scala.util.Random(17)
    val base = Array.fill(2000)(rnd.nextInt(500).toLong)
    val seen = (0L until 250L).toDF("url_hash")
    val expected = base.distinct.filter(_ >= 250).sorted.toSeq
    (1 to 4).foreach { trial =>
      val permuted = rnd.shuffle(base.toSeq) ++ rnd.shuffle(base.take(500).toSeq)
      val cand = permuted.toDF("url_hash").repartition(trial * 3)
      val pre = if (trial % 2 == 0)
        Some(SeenSet.prefilterPredicate(seen, 1000L, 0.01)) else None
      val out = SeenSet.sieve(cand, seen, pre)
        .as[Long].collect().sorted.toSeq
      assert(out == expected, s"trial $trial")
    }
  }
}
