package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  *  - `bruteForceTopK` — exact cosine top-k against a query vector: one
  *    narrow scan + a single top-k (TakeOrdered) — the correctness baseline.
  *  - `signBucket` / `lshTopK` — random-hyperplane LSH: deterministic integer
  *    hyperplanes, bucket = sign bits; at scale candidates come only from the
  *    query's bucket (a partition-pruned fraction of the corpus).
  *  - `ivfTopK` — IVF-style: k-means-free centroid assignment by bucket
  *    centroids; probe the closest `nprobe` buckets.
  *
  * All dot products run through the codegen'd higher-order `aggregate` over
  * `zip_with` (no UDFs), computed in double precision.
  */
object Ann {

  /** Cosine similarity of two float-array columns, in double precision. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  /** Deterministic pseudo-random hyperplane weight for (bit, dim):
    * integer in [-1000, 1000] — identical formula is emitted into oracle SQL
    * (`(bit*73856093 + i*19349663) % 2001 - 1000`, all terms non-negative so
    * `%` agrees across engines). */
  private def planeWeight(bit: Int, dim: Column): Column =
    (lit(bit.toLong * 73856093L) + dim.cast("long") * 19349663L) % 2001L - 1000L

  /** Sign-bucket of a vector under `nbits` deterministic hyperplanes:
    * bit b = sign of the dot product with hyperplane b. */
  def signBucket(vec: Column, nbits: Int): Column = {
    val idx = sequence(lit(0), size(vec) - 1)
    (0 until nbits).map { b =>
      val dot = aggregate(
        zip_with(vec, idx, (x, i) => x.cast("double") * planeWeight(b, i).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH top-k: exact cosine rank restricted to the query's sign-bucket. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, nbits: Int): DataFrame = {
    val qLit = typedLit(query.toSeq)
    val qBucket = signBucket(qLit, nbits)
    df.select(col(idCol), col(vecCol), signBucket(col(vecCol), nbits).as("bucket"))
      .filter(col("bucket") === qBucket)
      .select(col(idCol), cosine(col(vecCol), qLit).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact top-k by cosine against one query vector (broadcast scalar). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val qLit = typedLit(query.toSeq)
    df.select(col(idCol), cosine(col(vecCol), qLit).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF-style ANN: vectors are assigned to the nearest of `nlist` centroid
    * cells (training-free seeding: the centroids are the vectors with the
    * `nlist` smallest ids — deterministic, no k-means dependency); a query
    * probes its `nprobe` closest cells and ranks exactly within them. At
    * scale the assignment is precomputed and the cell id becomes a partition
    * key, so a query reads only nprobe/nlist of the corpus.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, nlist: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qLit = typedLit(query.toSeq)
    val cent = df.filter(col(idCol) < nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    val assignW = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cid"))
    val assigned = df.crossJoin(cent)
      .withColumn("csim", cosine(col(vecCol), col("cvec")))
      .withColumn("crn", row_number().over(assignW))
      .filter(col("crn") === 1)
      .select(col(idCol), col(vecCol), col("cid"))
    val probeW = Window.orderBy(col("qsim").desc, col("cid"))
    val probes = cent
      .withColumn("qsim", cosine(qLit, col("cvec")))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nprobe)
      .select("cid")
    assigned.join(probes, Seq("cid"), "left_semi")
      .select(col(idCol), cosine(col(vecCol), qLit).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
