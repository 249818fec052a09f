package graft

import graft.operators.{Ann, AnnIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ANN: persisted-index results equal the in-flight operator, the index scan
  * actually prunes partitions, and scalar twins are bit-identical to their
  * Column forms. */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embeddings(n: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("ivf: persisted index equals in-flight operator; scan prunes cells") {
    val emb = embeddings(400, 16).cache()
    val q = emb.filter(col("vec_id") === 3).head().getSeq[Float](1).toArray
    val dir = TestSpark.tempDir("ann_ivf")
    AnnIndex.buildIvf(emb, "vec_id", "embedding", dir, nlist = 8)
    val flight = Ann.ivfTopK(emb, "vec_id", "embedding", q, 10, nlist = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val indexed = AnnIndex.ivfTopK(spark, dir, "vec_id", "embedding", q, 10, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(flight == indexed, "persisted IVF differs from in-flight IVF")

    // partition pruning: the scan must read only the probed cell partitions
    val plan = AnnIndex.ivfTopK(spark, dir, "vec_id", "embedding", q, 10, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no cell partition filter in plan:\n${plan.take(800)}")
    val cellDirs = new java.io.File(s"$dir/data").listFiles()
      .count(_.getName.startsWith("cell="))
    assert(cellDirs == 8, s"expected 8 cell partitions, got $cellDirs")
  }

  test("lsh: persisted bucket index equals in-flight; one-bucket scan") {
    val emb = embeddings(300, 16).cache()
    val q = emb.filter(col("vec_id") === 5).head().getSeq[Float](1).toArray
    val dir = TestSpark.tempDir("ann_lsh")
    AnnIndex.buildLsh(emb, "vec_id", "embedding", dir, nbits = 4)
    val flight = Ann.lshTopK(emb, "vec_id", "embedding", q, 5, nbits = 4)
      .collect().map(_.getLong(0)).toSeq
    val indexed = AnnIndex.lshTopK(spark, dir, "vec_id", "embedding", q, 5, nbits = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(flight == indexed, "persisted LSH differs from in-flight LSH")
  }

  test("scalar twins match Column forms bit-for-bit") {
    import spark.implicits._
    val emb = embeddings(50, 16)
    val q = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    // signBucket
    val colBuckets = emb.select(col("vec_id"), Ann.signBucket(col("embedding"), 6))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    emb.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val got = Ann.signBucketScalar(r.getSeq[Float](1).toArray, 6)
      assert(got == colBuckets(r.getLong(0)))
    }
    // cosine
    val colCos = emb.select(col("vec_id"),
      Ann.cosine(col("embedding"), typedLit(q.toSeq))).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    emb.collect().foreach { r =>
      val got = Ann.cosineScalar(r.getSeq[Float](1), q.map(_.toDouble))
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(colCos(r.getLong(0))),
        s"cosine scalar/Column drift at ${r.getLong(0)}")
    }
  }
}
