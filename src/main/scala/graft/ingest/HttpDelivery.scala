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
  * non-retryable (other 4xx) before its backoff loop. The signing
  * step is deployment-specific (no network in this environment);
  * everything around it — chunking, classification, retry envelope,
  * exactly-once composition — is real:
  *
  *  - each PARTITION posts its own rows in bounded chunks, so delivery
  *    parallelism scales with the executor count and no executor ever
  *    materializes more than one chunk;
  *  - every chunk rides [[Pipelines.withRetries]] (initial 5 s, ×2,
  *    capped 60 s, 5 retries — the reference's envelope) with
  *    [[HttpDelivery.isRetryable]] as the classifier;
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
    */
  def postJsonLines(
      url: String,
      rows: Iterator[String],
      maxPerPost: Int = 500,
      headers: Map[String, String] = Map.empty,
      maxRetries: Int = 5,
      initialBackoffMs: Long = 5000L,
      capMs: Long = 60000L,
      sleep: Long => Unit = Thread.sleep): Long = {
    var n = 0L
    rows.grouped(maxPerPost).foreach { chunk =>
      val body = chunk.mkString("\n").getBytes(UTF_8)
      Pipelines.withRetries(maxRetries, initialBackoffMs, capMs, isRetryable,
        sleep)(post(url, body, headers))
      n += chunk.size
    }
    n
  }

  /** Deliver one (micro-)batch: JSON-serialize and post per partition.
    * `batchId` rides the `X-Graft-Batch` header so an idempotent
    * receiver can drop whole-batch replays (foreachBatch re-runs a
    * failed batch with the SAME id).
    */
  def deliver(
      df: DataFrame,
      url: String,
      batchId: Long = -1L,
      maxPerPost: Int = 500,
      maxRetries: Int = 5,
      initialBackoffMs: Long = 5000L,
      capMs: Long = 60000L,
      sleep: Long => Unit = Thread.sleep): Unit = {
    val headers = Map("X-Graft-Batch" -> batchId.toString)
    val json: Dataset[String] = df.toJSON
    json.foreachPartition { (it: Iterator[String]) =>
      postJsonLines(url, it, maxPerPost, headers, maxRetries,
        initialBackoffMs, capMs, sleep)
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
      sleep: Long => Unit = Thread.sleep): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        deliver(batch, url, id, maxPerPost, maxRetries,
          initialBackoffMs, capMs, sleep)
      }
      .option("checkpointLocation", checkpointLocation)
      .trigger(if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(1000L))
      .start()
}
