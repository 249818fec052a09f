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

  /** The request/response exchange WITHOUT the payload join: status, error
    * class, session-cookie round trip, logical fetch time, the (HTML) page
    * body when the extractor consumes it, and the corpus `pick` key.
    * This is the narrow row the round's critical path checkpoints — image
    * payloads attach later ([[attachPayload]]) inside the asynchronous pages
    * write, so megabytes per row never ride the critical path.
    *
    * @param serveHtml when true the server also returns the page's HTML
    *        rendering as a `page_bytes` payload column (status 200 only) —
    *        the link stage then parses the ACTUAL fetched bytes, matching the
    *        reference's parse-what-you-fetched contract
    *        (`workers/parsing_thread.clj:37-74`).
    */
  def attempt(dequeued: DataFrame, web: graft.sources.SynthWeb,
              cfg: CrawlConfig, roundTs: Long, serveHtml: Boolean): DataFrame = {
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
    dequeued
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
  }

  /** Scale-adaptive corpus side: a bench/test-sized corpus broadcasts (the
    * fetched side then keeps its politeness-bucket partitioning end-to-end —
    * no per-round exchange by `pick`); a 100 TB corpus degrades to the
    * shuffle-hash join, whose exchange is fully parallel. */
  private def corpusSide(corpusWithIdx: DataFrame, broadcastCorpus: Boolean,
                         cols: Column*): DataFrame = {
    val narrowed = corpusWithIdx.select(cols: _*)
    if (broadcastCorpus) broadcast(narrowed) else narrowed.hint("shuffle_hash")
  }

  /** Attach ONLY the content phash of each 200-row's payload (the narrow
    * corpus projection) — what the round's in-flight dedupe needs. */
  def attachPhash(attempted: DataFrame, corpusWithIdx: DataFrame,
                  broadcastCorpus: Boolean): DataFrame = {
    val c = corpusSide(corpusWithIdx, broadcastCorpus, col("corpus_idx"), col("phash"))
    attempted.join(c, attempted("pick") === c("corpus_idx"), "left")
      .drop("corpus_idx")
  }

  /** Attach the full image payload + per-row decode verification to 200-rows
    * (input_hint): decode the fetched bytes and check decoded-pixel PSNR >=
    * 40 dB for jpeg / exact pixels for png, plus exact caption equality,
    * against the deterministic ground truth. Sampled 1-in-verifySample by
    * url_hash (verifySample=1 => exhaustive — the tests and the bench run it
    * on every row). Runs inside the asynchronous pages-write lane: the
    * manifest still commits only after it completes, so the verification
    * contract is unchanged — it just overlaps the next round's compute. */
  def attachPayload(okRows: DataFrame, corpusWithIdx: DataFrame,
                    cfg: CrawlConfig, broadcastCorpus: Boolean): DataFrame = {
    val c = corpusSide(corpusWithIdx, broadcastCorpus, col("corpus_idx"),
      col("image_id"), col("bytes"), col("w"), col("h"), col("fmt"), col("caption"))
    val joined = okRows
      .join(c, okRows("pick") === c("corpus_idx"), "left")
      .drop("corpus_idx")
    val seed = cfg.seed
    val verifyUdf = udf { (imageId: String, bytes: Array[Byte], fmt: String,
                           w: Int, h: Int, caption: String) =>
      import graft.functions.{Hashing, Images}
      val idx = imageId.stripPrefix("img").toLong
      var src = idx
      while (src >= 97 && src % 97 == 0) src -= 97
      // the DECODE of the fetched bytes is per-row and never cached (it is
      // the verification's object); the ground-truth compare is STREAMING —
      // expected pixels recomputed per (x, y) in registers, decode buffers
      // reused per thread (Images.verifySynth) — so the verify loop moves no
      // per-row arrays and touches no shared cache lines (the 8-core level's
      // memory traffic was the round's scaling bottleneck, VERDICT r3;
      // this also retires the unbounded ground-truth memo, ADVICE r3)
      Images.verifySynth(bytes, Hashing.splitmix64(seed ^ (src * 0x9E37L)), w, h,
          exact = fmt == "png") &&
        caption == graft.sources.SynthWeb.caption(idx, seed)
    }
    joined.withColumn("verify_ok",
      when(col("status") === 200 && pmod(col("url_hash"), lit(cfg.verifySample.toLong)) === 0,
        verifyUdf(col("image_id"), col("bytes"), col("fmt"), col("w"), col("h"), col("caption")))
        .otherwise(lit(null).cast("boolean")))
  }

  /** Full fetch in one call (attempt + phash + payload + verify) — the
    * single-shot form used by tests and ad-hoc pipelines; the crawl round
    * splits the same pieces across its critical path and its async lane. */
  def run(dequeued: DataFrame, corpusWithIdx: DataFrame, web: graft.sources.SynthWeb,
          cfg: CrawlConfig, roundTs: Long, serveHtml: Boolean = false,
          broadcastCorpus: Boolean = false): DataFrame = {
    val meta = attachPhash(
      attempt(dequeued, web, cfg, roundTs, serveHtml), corpusWithIdx, broadcastCorpus)
    val ok = attachPayload(meta.filter(col("status") === 200),
      corpusWithIdx, cfg, broadcastCorpus)
    val nonOk = meta.filter(col("status") =!= 200)
      .withColumn("image_id", lit(null).cast("string"))
      .withColumn("bytes", lit(null).cast("binary"))
      .withColumn("w", lit(null).cast("int"))
      .withColumn("h", lit(null).cast("int"))
      .withColumn("fmt", lit(null).cast("string"))
      .withColumn("caption", lit(null).cast("string"))
      .withColumn("verify_ok", lit(null).cast("boolean"))
    ok.unionByName(nonOk).drop("pick")
  }
}
