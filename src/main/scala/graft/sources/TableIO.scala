package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Iceberg-style table layer: Parquet data files + JSON snapshot manifests
  * with atomic rename commit (SURVEY.md §7 "Built-in vs custom": the Iceberg
  * runtime jar is not available offline, so this implements the same commit
  * contract — snapshot isolation, atomic manifest swap, resume from the last
  * committed round — behind a small API that a real Iceberg catalog could
  * replace).
  *
  * Layout under workDir:
  *   {table}/r={round}/part-*.parquet     snapshot (frontier, host_state, ip_state)
  *   {table}/r={round}/...                delta    (seen, pages, metrics — read as
  *                                                  the union of deltas 0..N)
  *   manifest_r{N}.json                   commit record: tables, counts, config
  *                                        hash — written tmp + atomic rename
  *
  * This replaces the reference's crash-safe double-buffered store rewrite
  * (`/root/reference/src/clj/ramper/sieve/store.clj:37-78`: temp file +
  * atomic rename on close) at table granularity.
  */
final class TableIO(val workDir: String, spark: SparkSession) {
  private val root = Paths.get(workDir)
  Files.createDirectories(root)

  def tablePath(table: String, round: Int): String =
    root.resolve(table).resolve(s"r=$round").toString

  def write(table: String, round: Int, df: DataFrame): Unit = {
    // the pages table is dominated by the image `bytes` column — already
    // PNG/JPEG-compressed, so codec compression burns CPU for ~0 ratio;
    // store it uncompressed (the narrow tables keep the default codec)
    val w = df.write.mode("overwrite")
    val w2 = if (table == "pages") w.option("compression", "none") else w
    w2.parquet(tablePath(table, round))
  }

  /** Write a snapshot partitioned by `bucketCol` (one file per bucket via a
    * pre-shuffle into `buckets` tasks) — the at-rest layout that lets
    * readers prune buckets: resume/compose of a 10^10-URL frontier, and
    * eventually the per-round eligibility scan, can then touch only the
    * buckets they need instead of the whole table (Iceberg would express
    * this as a bucket partition transform). */
  def writeBucketed(table: String, round: Int, df: DataFrame,
                    bucketCol: String, buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode("overwrite").partitionBy(bucketCol)
      .parquet(tablePath(table, round))

  /** Row count from parquet footers only (no data scan). */
  def countRows(table: String, round: Int): Long =
    spark.read.parquet(tablePath(table, round)).count()

  def writeSnapshot(table: String, round: Int, df: DataFrame): Long = {
    write(table, round, df)
    countRows(table, round)
  }

  def readSnapshot(table: String, round: Int): DataFrame =
    spark.read.parquet(tablePath(table, round))

  private def compactedPath(table: String, round: Int): Path =
    root.resolve(table).resolve(s"c=$round")

  /** Highest compacted round ≤ `round` for a delta table, if any. */
  private def latestCompacted(table: String, round: Int): Option[Int] = {
    val dir = root.resolve(table)
    if (!Files.exists(dir)) return None
    val cs = Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .collect { case s if s.startsWith("c=") => s.stripPrefix("c=").toInt }
      .filter(_ <= round).toSeq
    if (cs.isEmpty) None else Some(cs.max)
  }

  /** Union of all committed deltas up to `round` (seen / pages / phash_seen):
    * the latest compacted consolidation plus every per-round delta after it. */
  def readDeltas(table: String, round: Int): DataFrame = {
    val c = latestCompacted(table, round)
    val base = c.map(r => compactedPath(table, r).toString).toSeq
    val from = c.map(_ + 1).getOrElse(0)
    val paths = base ++ (from to round).map(r => tablePath(table, r))
      .filter(p => Files.exists(Paths.get(p)))
    spark.read.parquet(paths: _*)
  }

  /** Compact a delta table's 0..round files into one consolidated dir
    * (≙ ByteArrayDiskQueues.collect / Iceberg snapshot compaction —
    * bounds file-count growth of long crawls). Crash-safe: the consolidated
    * dir appears atomically (tmp + rename); stale delta dirs are removed
    * after, and a crash in between leaves a readable overlap that
    * readDeltas resolves in favor of the compacted dir. */
  def compact(table: String, round: Int): Unit = {
    if (!Files.exists(root.resolve(table))) return
    val tmp = root.resolve(table).resolve(s".c=$round.tmp")
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    readDeltas(table, round).write.mode("overwrite").parquet(tmp.toString)
    Files.move(tmp, compactedPath(table, round), StandardCopyOption.ATOMIC_MOVE)
    val dir = root.resolve(table)
    Files.list(dir).iterator().asScala.toSeq.foreach { p =>
      val n = p.getFileName.toString
      val stale =
        (n.startsWith("r=") && n.stripPrefix("r=").toInt <= round) ||
          (n.startsWith("c=") && n.stripPrefix("c=").toInt < round)
      if (stale) org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    }
  }

  /** Highest round ≤ `round` with a full snapshot dir (anchor rounds write
    * snapshots; in between only deltas are committed). */
  def latestSnapshotRound(table: String, round: Int): Int =
    (0 to round).reverse.find(r => Files.exists(Paths.get(tablePath(table, r)))).getOrElse(0)

  /** Union of per-round delta dirs in (from..to], with the round recoverable
    * as the partition column `r` (basePath trick). None when no dir exists. */
  def readRange(table: String, from: Int, to: Int): Option[DataFrame] = {
    val paths = (from to to).map(r => tablePath(table, r))
      .filter(p => Files.exists(Paths.get(p)))
    if (paths.isEmpty) None
    else Some(spark.read.option("basePath", root.resolve(table).toString)
      .parquet(paths: _*))
  }

  private def manifestPath(round: Int): Path = root.resolve(s"manifest_r$round.json")

  /** Commit a round: manifest written to a temp file then atomically renamed
    * — a reader never observes a partial commit; a killed job resumes from
    * the highest manifest present (bit-identically, because rounds are
    * deterministic functions of committed state). The manifest carries
    * [[TableIO.StateFormat]] so a resume can detect snapshots written under
    * an older on-disk column semantics (e.g. the round-4 fb change from
    * url-hash bucket to host bucket) and recompute instead of trusting them. */
  def commit(round: Int, configHash: String, counts: Map[String, Long]): Unit = {
    val countsJson = counts.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    val json =
      s"""{"round": $round, "config_hash": "$configHash", "state_format": ${TableIO.StateFormat}, "counts": $countsJson}"""
    val tmp = root.resolve(s".manifest_r$round.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(round), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Highest committed round, if any. */
  def latestRound(): Option[Int] = {
    if (!Files.exists(root)) return None
    val rs = Files.list(root).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("manifest_r") && s.endsWith(".json") =>
        s.stripPrefix("manifest_r").stripSuffix(".json").toInt }
      .toSeq
    if (rs.isEmpty) None else Some(rs.max)
  }

  def readManifest(round: Int): String =
    new String(Files.readAllBytes(manifestPath(round)), StandardCharsets.UTF_8)

  /** The state_format a committed round's snapshots were written under
    * (0 = pre-versioning manifest, or none readable for that round). */
  def stateFormat(round: Int): Int =
    try """"state_format":\s*(\d+)""".r.findFirstMatchIn(readManifest(round))
      .map(_.group(1).toInt).getOrElse(0)
    catch { case _: Exception => 0 }
}

object TableIO {
  /** On-disk state-format version, bumped when a persisted column's MEANING
    * changes (not its name/type — schema evolution Parquet can see):
    *   1 — frontier `fb` = pmod(url_hash, K)
    *   2 — frontier `fb` = host bucket, pmod(xxhash64(host), K) (round 4:
    *       the dequeue eligibility scan prunes on it, so a stale url-hash
    *       fb would silently starve eligible hosts — ADVICE r4)
    * A resume that finds an older format recomputes the affected columns
    * from the logical row instead of trusting the snapshot verbatim. */
  val StateFormat: Int = 2
}
