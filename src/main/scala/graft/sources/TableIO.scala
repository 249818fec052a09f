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

  def write(table: String, round: Int, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(tablePath(table, round))

  /** Row count from parquet footers only (no data scan). */
  def countRows(table: String, round: Int): Long =
    spark.read.parquet(tablePath(table, round)).count()

  def writeSnapshot(table: String, round: Int, df: DataFrame): Long = {
    write(table, round, df)
    countRows(table, round)
  }

  def readSnapshot(table: String, round: Int): DataFrame =
    spark.read.parquet(tablePath(table, round))

  /** Union of all committed deltas up to `round` (seen / pages). */
  def readDeltas(table: String, round: Int): DataFrame = {
    val paths = (0 to round).map(r => tablePath(table, r))
      .filter(p => Files.exists(Paths.get(p)))
    spark.read.parquet(paths: _*)
  }

  private def manifestPath(round: Int): Path = root.resolve(s"manifest_r$round.json")

  /** Commit a round: manifest written to a temp file then atomically renamed
    * — a reader never observes a partial commit; a killed job resumes from
    * the highest manifest present (bit-identically, because rounds are
    * deterministic functions of committed state). */
  def commit(round: Int, configHash: String, counts: Map[String, Long]): Unit = {
    val countsJson = counts.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    val json =
      s"""{"round": $round, "config_hash": "$configHash", "counts": $countsJson}"""
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
}
