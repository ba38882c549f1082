package graft.ingest

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("withRetries follows the reference backoff envelope (5s ×2 cap 60s)") {
    val sleeps = mutable.ListBuffer.empty[Long]
    var calls = 0
    val got = Pipelines.withRetries(maxRetries = 5, sleep = (ms: Long) => sleeps += ms)({
      calls += 1
      if (calls <= 5) throw new RuntimeException("transient")
      "ok"
    })
    assert(got == "ok" && calls == 6)
    assert(sleeps.toSeq == Seq(5000L, 10000L, 20000L, 40000L, 60000L))
  }

  test("withRetries rethrows immediately on non-retryable errors") {
    var calls = 0
    val e = intercept[IllegalArgumentException] {
      Pipelines.withRetries(retryable = !_.isInstanceOf[IllegalArgumentException],
        sleep = _ => ())({ calls += 1; throw new IllegalArgumentException("fatal") })
    }
    assert(e.getMessage == "fatal" && calls == 1)
  }

  test("withRetries gives up after maxRetries") {
    var calls = 0
    intercept[RuntimeException] {
      Pipelines.withRetries(maxRetries = 3, sleep = _ => ())({
        calls += 1; throw new RuntimeException("always")
      })
    }
    assert(calls == 4)
  }
}
