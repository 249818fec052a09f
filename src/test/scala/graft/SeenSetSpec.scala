package graft

import graft.operators.{CuckooFilterAgg, SeenSet}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sieve semantics ("once and once only", sieve.clj:7-12) + the native
  * cuckoo TypedImperativeAggregate, with and without the pre-filter path. */
class SeenSetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cuckoo aggregate: distributed build has no false negatives") {
    val keys = (0L until 20000L).map(i => i * 2654435761L)
    val df = keys.toDF("url_hash").repartition(8)
    val blob = df.select(CuckooFilterAgg(col("url_hash"), 30000L)).head().getAs[Array[Byte]](0)
    val f = graft.operators.CuckooFilter.fromBytes(blob)
    assert(!f.overflowed)
    keys.foreach(k => assert(f.mightContain(k), s"false negative for $k"))
    val misses = (1L to 20000L).map(i => i * 7046029254386353131L)
      .count(k => f.mightContain(k) && !keys.contains(k))
    assert(misses < 200, s"fp rate too high: $misses/20000")
  }

  test("sieve emits each key once and only once, prefilter on and off") {
    // skewed keys, enqueued repeatedly (mercator_sieve_test.clj:34-58 intent)
    val rnd = new scala.util.Random(5)
    val keys = Array.fill(5000)(rnd.nextInt(800).toLong)
    val candidates = keys.toSeq.toDF("url_hash").withColumn("url", concat(lit("u"), col("url_hash")))
    val seen = (0L until 400L).toDF("url_hash").withColumn("url", concat(lit("u"), col("url_hash")))
    for (pre <- Seq(None,
      Some(SeenSet.prefilterPredicate(seen, 1000L, 0.01)))) {
      val out = SeenSet.sieve(candidates, seen, pre)
        .select("url_hash").as[Long].collect().sorted
      val expected = keys.map(_.toLong).distinct.filter(_ >= 400).sorted
      assert(out.toSeq == expected.toSeq, s"prefilter=${pre.isDefined}")
    }
  }

  test("anti-join empty seen passes everything through") {
    val candidates = Seq(1L, 2L, 2L, 3L).toDF("url_hash")
    val seen = spark.emptyDataset[Long].toDF("url_hash")
    assert(SeenSet.sieve(candidates, seen, None).count() == 3)
  }
}
