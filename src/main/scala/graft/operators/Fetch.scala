package graft.operators

import graft.CrawlConfig
import org.apache.spark.sql.{Column, DataFrame}
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
    * 6-43`: per-exception wait time, per-exception max retries with a default
    * of 5, and a killer set; applied `workers/fetching_thread.clj:86-120` —
    * retry while retries < max, then purge the host if the error class is a
    * killer, else drop the failing URL and carry on). Error classes are
    * strings here (the column value); waits are scaled to the engine's
    * logical clock rather than the reference's wall-clock hours. */
  final case class ErrorPolicy(waitMs: Long, maxRetries: Int, killer: Boolean)
  val defaultPolicy: ErrorPolicy = ErrorPolicy(8000L, 5, killer = false)
  val errorPolicies: Map[String, ErrorPolicy] = Map(
    // killer classes: host purged once the retry budget is exhausted
    "connect_timeout"     -> ErrorPolicy(4000L, 2, killer = true),
    "unknown_host"        -> ErrorPolicy(8000L, 2, killer = true),
    "no_route_to_host"    -> ErrorPolicy(16000L, 5, killer = true),
    "socket_error"        -> ErrorPolicy(8000L, 5, killer = true),
    "ssl_peer_unverified" -> ErrorPolicy(8000L, 0, killer = true),
    // transient classes: retry, then give up on the URL but keep the host
    "socket_timeout"      -> ErrorPolicy(8000L, 5, killer = false),
    "connection_closed"   -> ErrorPolicy(4000L, 2, killer = false),
    "no_http_response"    -> ErrorPolicy(4000L, 2, killer = false),
    "truncated_chunk"     -> ErrorPolicy(4000L, 1, killer = false),
    "malformed_chunk"     -> ErrorPolicy(4000L, 1, killer = false),
    // redirect loops: the URL is hopeless immediately, the host is fine
    "circular_redirect"   -> ErrorPolicy(0L, 0, killer = false),
    "redirect_exception"  -> ErrorPolicy(0L, 0, killer = false))

  /** Deterministic order for hashing an error class onto a broken host. */
  val errorClasses: IndexedSeq[String] = errorPolicies.keys.toIndexedSeq.sorted

  /** Catalyst lookup columns over an error-class string column — the policy
    * table as `when` chains (codegen'd; no join, no UDF). */
  def policyWait(err: Column): Column =
    errorPolicies.foldLeft(lit(defaultPolicy.waitMs)) { case (acc, (k, p)) =>
      when(err === k, lit(p.waitMs)).otherwise(acc)
    }
  def policyMaxRetries(err: Column): Column =
    errorPolicies.foldLeft(lit(defaultPolicy.maxRetries)) { case (acc, (k, p)) =>
      when(err === k, lit(p.maxRetries)).otherwise(acc)
    }
  def policyKiller(err: Column): Column =
    errorPolicies.foldLeft(lit(defaultPolicy.killer)) { case (acc, (k, p)) =>
      when(err === k, lit(p.killer)).otherwise(acc)
    }

  /** @param dequeued scheduler output: frontier cols + (ip, bucket, broken, crawl_delay_ms)
    * @param corpusWithIdx corpus table + `corpus_idx` long column
    * @param serveHtml when true the server also returns the page's HTML
    *        rendering as a `page_bytes` payload column (status 200 only) —
    *        the link stage then parses the ACTUAL fetched bytes, matching the
    *        reference's parse-what-you-fetched contract
    *        (`workers/parsing_thread.clj:37-74`). False keeps the column
    *        null and the synthetic-graph fast path ships no page bytes.
    * @return dequeued cols + (status, error, fetch_ts, page_bytes, image
    *         payload cols; payloads null unless status=200)
    */
  def run(dequeued: DataFrame, corpusWithIdx: DataFrame, web: graft.sources.SynthWeb,
          cfg: CrawlConfig, roundTs: Long, serveHtml: Boolean = false): DataFrame = {
    val status = when(col("broken"), lit(-1))
      .otherwise(when(pmod(xxhash64(col("url_hash")), lit(50)) === 0, lit(404))
        .otherwise(lit(200)))
    // broken hosts fail with a deterministic per-host error CLASS so the full
    // policy table (retry waits, killer purges, URL drops) is exercised
    val errClassUdf = udf((h: String) => web.errorClass(h))
    // synthetic session round-trip (G3 ≙ fetching_thread.clj:209-225): the
    // request PRESENTS the host's jar (`cookies` rides in from the
    // scheduler), the server validates the session token, and only hands out
    // Set-Cookie when the request carried no valid one — so the replayed
    // header deterministically changes the response, like a real session
    val sentSid = element_at(col("cookies"), "sid")
    val expectedSid = hex(xxhash64(col("host")))
    val attempted = dequeued
      .withColumn("status", status)
      .withColumn("error",
        when(col("status") === -1, errClassUdf(col("host"))).otherwise(lit(null).cast("string")))
      .withColumn("set_cookie",
        when(col("status") === 200 &&
            (sentSid.isNull || sentSid =!= expectedSid),
          concat(lit("sid="), expectedSid))
          .otherwise(lit(null).cast("string")))
      .withColumn("fetch_ts", lit(roundTs))
      .withColumn("page_bytes",
        if (serveHtml) {
          val htmlUdf = udf((u: String) =>
            web.htmlBody(u).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          when(col("status") === 200, htmlUdf(col("url"))).otherwise(lit(null).cast("binary"))
        } else lit(null).cast("binary"))
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
