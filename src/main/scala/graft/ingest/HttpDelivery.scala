package graft.ingest

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A14 external delivery: HTTP POST of JSON-lines batches — the
  * engine-side analog of the reference's signed-HTTP observability
  * client (source/collector/.../ObservabilityClient.scala:160-201),
  * which classifies responses into retryable (throttle / 5xx) and
  * non-retryable (other 4xx) before its backoff loop. Everything the
  * reference's client does around the AWS SDK — chunking,
  * classification, retry envelope, request signing, a bounded
  * connection pool, exactly-once composition — has a real counterpart
  * here:
  *
  *  - each PARTITION posts its own rows in bounded chunks, so delivery
  *    parallelism scales with the executor count and no executor ever
  *    materializes more than one chunk;
  *  - every chunk rides [[Pipelines.withRetries]] (initial 5 s, ×2,
  *    capped 60 s, 5 retries — the reference's envelope) with
  *    [[HttpDelivery.isRetryable]] as the classifier;
  *  - requests are SIGNED through a pluggable [[RequestSigner]] — the
  *    generic form of the reference's SigV4 step
  *    (ObservabilityClient.scala:55-56,62-73: `Aws4Signer.create`,
  *    signing name "osis", applied to the fully-built request before
  *    send). The signer runs INSIDE the retry loop, so a signer that
  *    embeds freshness (a timestamp/nonce) re-signs every attempt,
  *    exactly like re-building `signedRequest` per call. [[hmacSigner]]
  *    is the batteries-included HMAC-SHA256 implementation (public
  *    construction — keyed hash of the body, hex-encoded) for
  *    shared-secret receivers; cloud deployments plug their SDK's
  *    signer as a closure without this module knowing about it;
  *  - `maxConnections` bounds delivery concurrency toward the sink —
  *    the reference caps its Apache client pool at 4 connections
  *    (ObservabilityClient.scala:60-63, `maxConnections(4)`). Here one
  *    running partition holds at most one connection (posts are
  *    sequential within a partition), so coalescing the batch to
  *    ≤ `maxConnections` partitions enforces the same politeness knob
  *    cluster-wide: at 1000 executors an unbounded `foreachPartition`
  *    would open 1000 concurrent streams against the receiver;
  *  - [[sink]] wraps delivery in `foreachBatch`, which is at-least-once
  *    on failure/restart — compose with the upstream
  *    `dropDuplicatesWithinWatermark` delivery dedup
  *    (Pipelines.Config.dedupeDelivery) and/or an idempotent receiver.
  *    CAUTION on receiver-side dedup granularity: a batch is delivered
  *    NON-atomically (per partition, per chunk), so a receiver that
  *    drops every repeat of a seen `X-Graft-Batch` id would permanently
  *    lose the chunks a partially-failed first attempt never delivered.
  *    Dedup on the batch id alone is only safe when the receiver
  *    commits the whole batch atomically; otherwise key idempotency on
  *    row identity (or on the (batch, partition, chunk) triple — both
  *    posts carry the batch id header, and chunk boundaries are
  *    deterministic for a given partitioning).
  */
object HttpDelivery {

  /** Pluggable request authentication: given the target URL, the exact
    * body bytes about to be sent, and the headers assembled so far,
    * return the headers to send (typically the input plus a signature).
    * Must be serializable — it crosses the closure boundary into
    * executors. Invoked once per ATTEMPT (inside the retry loop), so
    * freshness-sensitive signatures stay valid across backoff sleeps.
    */
  type RequestSigner = (String, Array[Byte], Map[String, String]) => Map[String, String]

  /** The identity signer: headers pass through unsigned. */
  val noSigner: RequestSigner = (_, _, headers) => headers

  /** Shared-secret HMAC-SHA256 request signer — the generic stand-in
    * for the reference's SigV4 signing step. The MAC covers the
    * CANONICAL REQUEST ([[canonicalRequest]]): target URL, every header
    * handed to the signer (notably `X-Graft-Batch`, which drives
    * receiver-side batch dedup), and the body — so a captured chunk can
    * neither be re-posted against a different endpoint nor replayed
    * under a different batch id and still verify (body-only MACs allow
    * both). Adds `X-Graft-Key-Id: <keyId>`,
    * `X-Graft-Signed-Headers: <;-joined lowercase covered names>`
    * (SigV4's SignedHeaders move — the receiver learns exactly which
    * headers to pull back out of the request), and
    * `X-Graft-Signature: <hex hmac-sha256(secret, canonical)>`.
    *
    * Replay window: SAME-request replays still verify (the MAC is
    * deterministic) — that is by design, because the at-least-once
    * delivery itself re-posts verbatim chunks on retry/restart, and
    * the receiver's `X-Graft-Batch` dedup is the idempotency layer.
    * A receiver needing a bounded replay window should require a
    * freshness header (timestamp/nonce) in the signed set — the signer
    * runs per ATTEMPT, so such headers re-sign naturally; swap in a
    * closure over your SDK's signer for full canonical-request schemes
    * like SigV4.
    */
  def hmacSigner(keyId: String, secret: Array[Byte]): RequestSigner =
    (url, body, headers) => headers +
      ("X-Graft-Key-Id" -> keyId) +
      ("X-Graft-Signed-Headers" -> signedHeaderNames(headers)) +
      ("X-Graft-Signature" ->
        hmacSha256Hex(secret, canonicalRequest(url, body, headers)))

  /** The `;`-joined lowercase sorted names of the covered headers. */
  def signedHeaderNames(headers: Map[String, String]): String =
    headers.keys.map(_.toLowerCase).toSeq.sorted.mkString(";")

  /** The byte string [[hmacSigner]] MACs: the URL, the covered header
    * list, each covered `name:value` pair (lowercase names, sorted),
    * then the raw body — newline-framed so no field can smear into its
    * neighbor. A receiver rebuilds it from the request URL, the
    * `X-Graft-Signed-Headers` list, and the received header values.
    *
    * The framing only prevents smearing if the framed fields cannot
    * CONTAIN the frame characters, so inputs that would let two
    * different requests share canonical bytes are REJECTED (SigV4's
    * canonicalization constraints): newlines anywhere (a value or URL
    * with '\n' forges extra lines), ';' in a header name (splits the
    * signed-header list), and names that collide after lowercasing
    * (the Map would silently collapse one value, signing a request the
    * receiver cannot reconstruct). HTTP itself forbids all three on
    * the wire — this surfaces them at signing time instead of
    * producing an ambiguous MAC.
    */
  def canonicalRequest(
      url: String,
      body: Array[Byte],
      headers: Map[String, String]): Array[Byte] = {
    require(!url.exists(c => c == '\n' || c == '\r'),
      "canonicalRequest: URL must not contain newlines")
    headers.foreach { case (k, v) =>
      require(!k.exists(c => c == '\n' || c == '\r' || c == ';' || c == ':'),
        s"canonicalRequest: header name '$k' contains a framing character (\\n, ;, :)")
      require(!v.exists(c => c == '\n' || c == '\r'),
        s"canonicalRequest: value of header '$k' contains a newline — " +
          "two requests could share identical canonical bytes")
    }
    val lower = headers.map { case (k, v) => k.toLowerCase -> v }
    require(lower.size == headers.size,
      "canonicalRequest: header names collide after lowercasing — " +
        s"[${headers.keys.toSeq.sorted.mkString(", ")}]")
    val names = lower.keys.toSeq.sorted
    val head = (url +: names.mkString(";") +: names.map(n => s"$n:${lower(n)}"))
      .mkString("\n") + "\n"
    head.getBytes(UTF_8) ++ body
  }

  /** Hex HMAC-SHA256 — JDK javax.crypto only, no dependency. */
  def hmacSha256Hex(secret: Array[Byte], body: Array[Byte]): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret, "HmacSHA256"))
    mac.doFinal(body).map("%02x".format(_)).mkString
  }

  /** Non-2xx response, carrying the status for classification. */
  final class HttpStatusException(val code: Int, msg: String)
    extends RuntimeException(msg)

  /** The reference's retryable set: throttling (429), request timeout
    * (408), every 5xx, and transport-level IO failures (connection
    * reset/refused mid-flight). Other 4xx are caller bugs — retrying
    * them can only duplicate load.
    */
  def isRetryable(e: Throwable): Boolean = e match {
    case h: HttpStatusException => h.code == 429 || h.code == 408 || h.code >= 500
    case _: IOException => true
    case _ => false
  }

  /** One POST; throws [[HttpStatusException]] on non-2xx. JDK
    * HttpURLConnection — no dependency, serializable-free (only the
    * URL string crosses the closure boundary).
    */
  def post(
      url: String,
      body: Array[Byte],
      headers: Map[String, String] = Map.empty): Int = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      conn.setRequestProperty("Content-Type", "application/json")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val out = conn.getOutputStream
      try { out.write(body); out.flush() } finally out.close()
      val code = conn.getResponseCode
      // drain whichever stream the connection produced so it can be reused
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      if (in != null) try {
        val buf = new Array[Byte](4096)
        while (in.read(buf) >= 0) ()
      } finally in.close()
      if (code < 200 || code >= 300)
        throw new HttpStatusException(code, s"HTTP $code from $url")
      code
    } finally conn.disconnect()
  }

  /** Post an iterator of JSON rows as newline-delimited chunks of at
    * most `maxPerPost`, each chunk inside the retry envelope. Returns
    * rows posted. Runs on the executor — this is the per-partition body.
    * The signer runs per attempt, inside the retried thunk.
    */
  def postJsonLines(
      url: String,
      rows: Iterator[String],
      maxPerPost: Int = 500,
      headers: Map[String, String] = Map.empty,
      maxRetries: Int = 5,
      initialBackoffMs: Long = 5000L,
      capMs: Long = 60000L,
      sleep: Long => Unit = Thread.sleep,
      sign: RequestSigner = noSigner): Long = {
    var n = 0L
    rows.grouped(maxPerPost).foreach { chunk =>
      val body = chunk.mkString("\n").getBytes(UTF_8)
      Pipelines.withRetries(maxRetries, initialBackoffMs, capMs, isRetryable,
        sleep)(post(url, body, sign(url, body, headers)))
      n += chunk.size
    }
    n
  }

  /** Deliver one (micro-)batch: JSON-serialize and post per partition.
    * `batchId` rides the `X-Graft-Batch` header so an idempotent
    * receiver can drop whole-batch replays (foreachBatch re-runs a
    * failed batch with the SAME id). `maxConnections > 0` coalesces the
    * batch to that many partitions first, bounding concurrent requests
    * against the receiver to at most that many (the reference's
    * `maxConnections(4)` pool cap); 0 leaves the batch's own
    * partitioning — delivery concurrency then scales with the executor
    * count, which only an unbounded receiver should accept.
    */
  def deliver(
      df: DataFrame,
      url: String,
      batchId: Long = -1L,
      maxPerPost: Int = 500,
      maxRetries: Int = 5,
      initialBackoffMs: Long = 5000L,
      capMs: Long = 60000L,
      sleep: Long => Unit = Thread.sleep,
      sign: RequestSigner = noSigner,
      maxConnections: Int = 0): Unit = {
    val headers = Map("X-Graft-Batch" -> batchId.toString)
    val src = if (maxConnections > 0) df.coalesce(maxConnections) else df
    val json: Dataset[String] = src.toJSON
    json.foreachPartition { (it: Iterator[String]) =>
      postJsonLines(url, it, maxPerPost, headers, maxRetries,
        initialBackoffMs, capMs, sleep, sign)
      ()
    }
  }

  /** Streaming HTTP sink: `foreachBatch` posting each micro-batch via
    * [[deliver]]. At-least-once by construction — pair with the
    * upstream watermark dedup or a receiver keyed on `X-Graft-Batch`.
    */
  def sink(
      df: DataFrame,
      url: String,
      checkpointLocation: String,
      maxPerPost: Int = 500,
      availableNow: Boolean = true,
      maxRetries: Int = 5,
      initialBackoffMs: Long = 5000L,
      capMs: Long = 60000L,
      sleep: Long => Unit = Thread.sleep,
      sign: RequestSigner = noSigner,
      maxConnections: Int = 0): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        deliver(batch, url, id, maxPerPost, maxRetries,
          initialBackoffMs, capMs, sleep, sign, maxConnections)
      }
      .option("checkpointLocation", checkpointLocation)
      .trigger(if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(1000L))
      .start()
}
