package graft.operators

import graft.CrawlConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fetch stage (SURVEY.md §2.6), grafted: "fetching" a URL is a
  * deterministic join against the seeded image+caption corpus — no network,
  * bit-reproducible (≙ the reference's graph-server load protocol,
  * `/root/reference/README.md:36-41`; real HTTP lives in
  * `workers/fetching_thread.clj:46-132` and would slot in as a `mapPartitions`
  * stage behind the same column contract).
  *
  * Everything here is built-in Catalyst expressions (whole-stage codegen):
  * status simulation via `xxhash64`, payload lookup via an equi-join on the
  * corpus index. The corpus side is broadcast when small; at 100 TB corpus
  * scale the same plan degrades gracefully to a shuffle join on `pick`, which
  * AQE can re-plan.
  */
object Fetch {

  /** Per-error retry policy (≙ `/root/reference/src/clj/ramper/constants.clj:
    * 6-43`: per-exception wait + max retries + killer set). */
  final case class ErrorPolicy(waitMs: Long, maxRetries: Int, killer: Boolean)
  val errorPolicies: Map[String, ErrorPolicy] = Map(
    "connect_timeout" -> ErrorPolicy(8000L, 3, false),
    "unknown_host"    -> ErrorPolicy(60000L, 2, true))

  /** @param dequeued scheduler output: frontier cols + (ip, bucket, broken, crawl_delay_ms)
    * @param corpusWithIdx corpus table + `corpus_idx` long column
    * @return dequeued cols + (status, error, fetch_ts, image payload cols; payload
    *         null unless status=200)
    */
  def run(dequeued: DataFrame, corpusWithIdx: DataFrame,
          cfg: CrawlConfig, roundTs: Long): DataFrame = {
    val status = when(col("broken"), lit(-1))
      .otherwise(when(pmod(xxhash64(col("url_hash")), lit(50)) === 0, lit(404))
        .otherwise(lit(200)))
    val attempted = dequeued
      .withColumn("status", status)
      .withColumn("error",
        when(col("status") === -1, lit("connect_timeout")).otherwise(lit(null).cast("string")))
      .withColumn("fetch_ts", lit(roundTs))
      .withColumn("pick",
        when(col("status") === 200, pmod(col("url_hash"), lit(cfg.corpusSize.toLong)))
          .otherwise(lit(null).cast("long")))
    // shuffle-hash join, not broadcast: the corpus carries image bytes, and
    // a per-round driver-side broadcast build of megabytes of payload is a
    // serial cost that caps scaling — while the shuffle is fully parallel
    // and is the only plan that survives a 100 TB corpus anyway
    val joined = attempted
      .join(corpusWithIdx.hint("shuffle_hash"),
        attempted("pick") === corpusWithIdx("corpus_idx"), "left")
      .drop("pick", "corpus_idx")
    // per-row payload verification (input_hint): decode the fetched bytes and
    // check decoded-pixel PSNR >= 40 dB for jpeg / exact pixels for png,
    // plus exact caption equality, against the deterministic ground truth.
    // Sampled 1-in-verifySample by url_hash (verifySample=1 => exhaustive,
    // used by the tests; large crawls sample to keep decode off the critical
    // path without losing the invariant).
    val seed = cfg.seed
    val verifyUdf = udf { (imageId: String, bytes: Array[Byte], fmt: String,
                           w: Int, h: Int, caption: String) =>
      import graft.functions.{Hashing, Images}
      val idx = imageId.stripPrefix("img").toLong
      var src = idx
      while (src >= 97 && src % 97 == 0) src -= 97
      val expected = Images.synthPixels(Hashing.splitmix64(seed ^ (src * 0x9E37L)), w, h)
      val (px, dw, dh) = Images.decode(bytes)
      val pixelsOk =
        if (fmt == "png") dw == w && dh == h && px.sameElements(expected)
        else dw == w && dh == h && Images.psnr(expected, px) >= 40.0
      pixelsOk && caption == graft.sources.SynthWeb.caption(idx, seed)
    }
    joined.withColumn("verify_ok",
      when(col("status") === 200 && pmod(col("url_hash"), lit(cfg.verifySample.toLong)) === 0,
        verifyUdf(col("image_id"), col("bytes"), col("fmt"), col("w"), col("h"), col("caption")))
        .otherwise(lit(null).cast("boolean")))
  }
}
