package graft.ingest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** A14: the HTTP delivery path (ObservabilityClient.scala:160-201 analog)
  * against an in-process JDK HttpServer stub — delivery, chunking,
  * retryable (5xx/429) vs non-retryable (4xx) classification through
  * Pipelines.withRetries, and exactly-once composition with the
  * upstream watermark dedup. The stub lives in the test JVM; local-mode
  * executors reach it over loopback, so the posting path (serialization
  * boundary included) is the real one.
  */
/** One SUCCESSFUL signed request as the receiver saw it: the auth
  * headers plus everything needed to REBUILD the canonical request
  * (the signed-header list, those headers' received values, the body).
  */
private[ingest] final case class SignedReq(keyId: String, sig: String,
    signedHeaders: String, batch: String, body: String)

class HttpDeliverySpec extends SparkTestBase {
  import spark.implicits._

  /** Records every POST; fails the first `failFirst` requests with
    * `failCode` before succeeding.
    */
  private final class Stub {
    val bodies = new ConcurrentLinkedQueue[(String, String)]()
    val sigs = new ConcurrentLinkedQueue[SignedReq]()
    val requests = new AtomicInteger(0)
    val inFlight = new AtomicInteger(0)
    val maxInFlight = new AtomicInteger(0)
    @volatile var failFirst = 0
    @volatile var failCode = 503
    @volatile var handlerDelayMs = 0L
    // when set, the FIRST request blocks until a second arrives (the
    // deterministic overlap probe — no timing window to race)
    @volatile var holdFirstForOverlap = false
    private val overlapSeq = new AtomicInteger(0)
    private val overlapGate = new java.util.concurrent.CountDownLatch(1)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ingest", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        val cur = inFlight.incrementAndGet()
        maxInFlight.getAndUpdate(m => math.max(m, cur))
        if (holdFirstForOverlap) {
          if (overlapSeq.incrementAndGet() == 1)
            overlapGate.await(15, java.util.concurrent.TimeUnit.SECONDS)
          else overlapGate.countDown()
        }
        if (handlerDelayMs > 0) Thread.sleep(handlerDelayMs)
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val n = requests.incrementAndGet()
        if (n <= failFirst) {
          ex.sendResponseHeaders(failCode, -1)
        } else {
          bodies.add((ex.getRequestHeaders.getFirst("X-Graft-Batch"), body))
          Option(ex.getRequestHeaders.getFirst("X-Graft-Signature"))
            .foreach(sig => sigs.add(SignedReq(
              ex.getRequestHeaders.getFirst("X-Graft-Key-Id"), sig,
              ex.getRequestHeaders.getFirst("X-Graft-Signed-Headers"),
              ex.getRequestHeaders.getFirst("X-Graft-Batch"), body)))
          val ok = "ok".getBytes(UTF_8)
          ex.sendResponseHeaders(200, ok.length)
          ex.getResponseBody.write(ok)
        }
        ex.close()
      } finally inFlight.decrementAndGet()
    })
    // a concurrent executor so the in-flight gauge measures the CLIENT's
    // concurrency, not the default single dispatcher thread's
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16))
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/ingest"
    def stop(): Unit = server.stop(0)
    def deliveredLines: List[String] =
      bodies.asScala.toList.flatMap(_._2.split("\n"))
  }

  private def withStub(f: Stub => Unit): Unit = {
    val stub = new Stub
    try f(stub) finally stub.stop()
  }

  test("delivers a batch as chunked JSON lines") {
    withStub { stub =>
      val df = (1 to 7).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
        .coalesce(1)
      HttpDelivery.deliver(df, stub.url, batchId = 42L, maxPerPost = 3,
        initialBackoffMs = 1L)
      // 7 rows / 3-per-post = 3 chunks, all carrying the batch header
      assert(stub.requests.get() == 3)
      assert(stub.bodies.asScala.forall(_._1 == "42"))
      val ids = stub.deliveredLines.flatMap(
        "\"id\":(\\d+)".r.findFirstMatchIn(_)).map(_.group(1).toLong).sorted
      assert(ids == (1L to 7L).toList)
    }
  }

  test("chunk boundaries: empty partitions post nothing; exact multiples split clean") {
    withStub { stub =>
      // 6 rows over 4 partitions -> some partitions empty; no empty POSTs
      val df = (1 to 6).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
        .repartition(4)
      HttpDelivery.deliver(df, stub.url, maxPerPost = 100, initialBackoffMs = 1L)
      assert(stub.bodies.asScala.forall(_._2.nonEmpty), "no empty bodies")
      assert(stub.deliveredLines.size == 6)
    }
    withStub { stub =>
      // exactly 2 chunks of 3 — no trailing empty chunk
      val df = (1 to 6).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
        .coalesce(1)
      HttpDelivery.deliver(df, stub.url, maxPerPost = 3, initialBackoffMs = 1L)
      assert(stub.requests.get() == 2, s"got ${stub.requests.get()} posts")
      assert(stub.bodies.asScala.forall(_._2.split("\n").length == 3))
    }
    withStub { stub =>
      // an empty frame delivers zero posts (and doesn't error)
      val df = Seq.empty[(Long, String)].toDF("id", "payload")
      HttpDelivery.deliver(df, stub.url, initialBackoffMs = 1L)
      assert(stub.requests.get() == 0)
    }
  }

  test("retryable 5xx and 429 are retried until success") {
    withStub { stub =>
      stub.failFirst = 2 // two 503s, then 200
      val df = Seq((1L, "a")).toDF("id", "payload").coalesce(1)
      HttpDelivery.deliver(df, stub.url, initialBackoffMs = 1L, capMs = 2L)
      assert(stub.requests.get() == 3, "two retries then success")
      assert(stub.deliveredLines.size == 1)
    }
    withStub { stub =>
      stub.failFirst = 1
      stub.failCode = 429 // throttle classifies as retryable
      val df = Seq((1L, "a")).toDF("id", "payload").coalesce(1)
      HttpDelivery.deliver(df, stub.url, initialBackoffMs = 1L, capMs = 2L)
      assert(stub.requests.get() == 2)
      assert(stub.deliveredLines.size == 1)
    }
  }

  test("non-retryable 4xx fails fast after exactly one attempt") {
    withStub { stub =>
      stub.failFirst = Int.MaxValue
      stub.failCode = 400
      val df = Seq((1L, "a")).toDF("id", "payload").coalesce(1)
      val e = intercept[Exception] {
        HttpDelivery.deliver(df, stub.url, initialBackoffMs = 1L)
      }
      // surfaces through the Spark job failure with the status intact
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists {
        case h: HttpDelivery.HttpStatusException => h.code == 400
        case _ => false
      }, s"expected HTTP 400 in cause chain of $e")
      assert(stub.requests.get() == 1, "400 must not be retried")
    }
  }

  test("retries past exhaustion rethrow (5 retries = 6 attempts)") {
    withStub { stub =>
      stub.failFirst = Int.MaxValue
      stub.failCode = 503
      val df = Seq((1L, "a")).toDF("id", "payload").coalesce(1)
      intercept[Exception] {
        HttpDelivery.deliver(df, stub.url, initialBackoffMs = 1L, capMs = 1L)
      }
      assert(stub.requests.get() == 6)
    }
  }

  test("hmac signing: the canonical-request MAC verifies at the receiver, survives retries, rejects tampering") {
    withStub { stub =>
      stub.failFirst = 2 // two 503s force the signed POST through the retry loop
      val secret = "graft-shared-secret".getBytes(UTF_8)
      val df = (1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
        .coalesce(1)
      HttpDelivery.deliver(df, stub.url, batchId = 7L, initialBackoffMs = 1L,
        capMs = 2L, sign = HttpDelivery.hmacSigner("key-1", secret))
      assert(stub.requests.get() == 3, "two retries then success")
      val delivered = stub.sigs.asScala.toList
      assert(delivered.nonEmpty, "signed request must reach the receiver")
      // receiver-side verification: the X-Graft-Signed-Headers list says
      // which received headers to pull back into the canonical request
      def mac(url: String, req: SignedReq, batch: String) = {
        assert(req.signedHeaders == "x-graft-batch",
          "delivery signs exactly the headers it was handed")
        HttpDelivery.hmacSha256Hex(secret, HttpDelivery.canonicalRequest(
          url, req.body.getBytes(UTF_8), Map("X-Graft-Batch" -> batch)))
      }
      delivered.foreach { req =>
        assert(req.keyId == "key-1")
        assert(req.sig == mac(stub.url, req, req.batch),
          "signature must verify against url + signed headers + body")
        // the MAC covers the batch id and the URL: a replay under a
        // different batch id, or re-posted elsewhere, must NOT verify
        assert(req.sig != mac(stub.url, req, "8"),
          "batch-id tampering must break the MAC")
        assert(req.sig != mac("http://evil.example/ingest", req, req.batch),
          "re-targeting must break the MAC")
      }
      // batch header still rides alongside the signature headers
      assert(stub.bodies.asScala.forall(_._1 == "7"))
    }
  }

  test("canonicalRequest rejects inputs that could make two requests share canonical bytes") {
    val body = "b".getBytes(UTF_8)
    // a header VALUE containing '\n' can forge extra canonical lines:
    // ("H" -> "v\nx-other:y") frames identically to two real headers
    intercept[IllegalArgumentException] {
      HttpDelivery.canonicalRequest("http://h/x", body, Map("H" -> "v\nx-other:y"))
    }
    // ';' in a NAME splits the signed-header list ambiguously
    intercept[IllegalArgumentException] {
      HttpDelivery.canonicalRequest("http://h/x", body, Map("a;b" -> "v"))
    }
    // names colliding after lowercasing: the Map silently collapses one
    // value, signing a request the receiver cannot reconstruct
    intercept[IllegalArgumentException] {
      HttpDelivery.canonicalRequest("http://h/x", body,
        Map("X-Graft-Batch" -> "1", "x-graft-batch" -> "2"))
    }
    // a URL carrying a newline forges header lines too
    intercept[IllegalArgumentException] {
      HttpDelivery.canonicalRequest("http://h/x\nx-graft-batch:9", body, Map.empty)
    }
    // the legal shape still signs, and ':' inside a VALUE is fine (names
    // cannot contain ':', so the receiver's first-colon split is unique)
    val ok = HttpDelivery.canonicalRequest("http://h/x", body,
      Map("X-Graft-Batch" -> "7", "X-Time" -> "12:30:00"))
    assert(new String(ok, UTF_8).startsWith("http://h/x\nx-graft-batch;x-time\n"))
  }

  test("maxConnections bounds concurrent in-flight requests at the receiver") {
    withStub { stub =>
      stub.handlerDelayMs = 120L
      // 32 single-row posts across 16 partitions — unbounded delivery
      // would run one connection per concurrently-running task
      val df = (1 to 32).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
        .repartition(16)
      HttpDelivery.deliver(df, stub.url, maxPerPost = 1,
        initialBackoffMs = 1L, maxConnections = 2)
      assert(stub.deliveredLines.size == 32, "cap must not drop rows")
      assert(stub.maxInFlight.get() <= 2,
        s"in-flight peaked at ${stub.maxInFlight.get()}, cap is 2")
    }
    withStub { stub =>
      // control: the same workload UNCAPPED overlaps — proves the gauge
      // measures real concurrency rather than passing vacuously. The
      // stub HOLDS the first request open until a second arrives (no
      // fixed-delay timing window to race on a loaded runner); Spark
      // keeps scheduling the other 15 partitions' tasks while the first
      // poster blocks, so the rendezvous is deterministic given ≥2
      // task slots — asserted as the precondition.
      assume(spark.sparkContext.defaultParallelism >= 2,
        "overlap control needs two concurrent task slots")
      stub.holdFirstForOverlap = true
      val df = (1 to 32).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
        .repartition(16)
      HttpDelivery.deliver(df, stub.url, maxPerPost = 8, initialBackoffMs = 1L)
      assert(stub.maxInFlight.get() >= 2,
        s"control run never overlapped (max ${stub.maxInFlight.get()})")
    }
  }

  test("streaming sink composes with watermark dedup for exactly-once content") {
    withStub { stub =>
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files
        .createTempDirectory("graft_http_sink").toString
      val input = MemoryStream[(Long, Timestamp)]
      val deduped = input.toDF().toDF("id", "ts")
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark("id")
      val q = HttpDelivery.sink(deduped, stub.url, s"$dir/ckpt",
        maxPerPost = 100, availableNow = false, initialBackoffMs = 1L)
      try {
        val t0 = 1767225600000L
        input.addData((1L, new Timestamp(t0)), (2L, new Timestamp(t0 + 1000)),
          (2L, new Timestamp(t0 + 2000)))
        q.processAllAvailable()
        // an at-least-once upstream redelivers id 1 and 2 in a later
        // micro-batch; the watermark dedup drops both replays
        input.addData((1L, new Timestamp(t0 + 3000)), (2L, new Timestamp(t0 + 4000)),
          (3L, new Timestamp(t0 + 5000)))
        q.processAllAvailable()
        val ids = stub.deliveredLines.flatMap(
          "\"id\":(\\d+)".r.findFirstMatchIn(_)).map(_.group(1).toLong).sorted
        assert(ids == List(1L, 2L, 3L), s"each id exactly once, got $ids")
      } finally q.stop()
    }
  }
}
