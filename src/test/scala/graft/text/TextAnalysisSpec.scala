package graft.text

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("tokenCount: whitespace runs, trimmed, blank → 0") {
    val got = Seq("a b  c", "  x ", "", "   ").toDF("t")
      .select(TextAnalysis.tokenCount($"t").as("n")).as[Long].collect().toSeq
    assert(got == Seq(3L, 1L, 0L, 0L))
  }

  test("char-class counts split the string completely") {
    val s = "ab1 2c!?"
    val row = Seq(s).toDF("t").select(
      TextAnalysis.alphaCount($"t").as("a"),
      TextAnalysis.digitCount($"t").as("d"),
      TextAnalysis.spaceCount($"t").as("sp"),
      TextAnalysis.punctCount($"t").as("p")).as[(Long, Long, Long, Long)].head()
    assert(row == ((3L, 2L, 1L, 2L)))
    assert(row._1 + row._2 + row._3 + row._4 == s.length)
  }

  test("subwordCount: ≤4-letter runs, digits, single glyphs") {
    val got = Seq("hello world9!").toDF("t")
      .select(TextAnalysis.subwordCount($"t")).as[Long].head()
    // hell+o, worl+d, 9, ! = 6
    assert(got == 6L)
  }

  test("langId votes by stopword profile with priority tie-break") {
    val got = Seq(
      "the cat and the dog of a house",
      "der hund und die katze und das haus",
      "le chat et la maison et les chiens",
      "el gato y los perros y las casas",
      "xyzzy plugh 42").toDF("t")
      .select(TextAnalysis.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "es", "und"))
  }

  test("qualityScore is in [0,1] and rewards clean English text") {
    val rows = Seq(
      "the quick brown fox and the lazy dog of a farm " * 10,
      "@@@@ #### $$$$ %%%%").toDF("t")
      .select(TextAnalysis.qualityScore($"t")).as[Double].collect()
    assert(rows.forall(v => v >= 0.0 && v <= 1.0))
    assert(rows(0) > rows(1))
  }

  test("fingerprint collapses token order and repetition") {
    val fps = Seq("b a a b", "a b", "a c").toDF("t")
      .select(TextAnalysis.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1) && fps(1) != fps(2))
  }

  test("topTokenShare = max token frequency / tokens, row-local") {
    val got = Seq("a a a b", "a b c d", "", "x").toDF("t")
      .select(TextAnalysis.topTokenShare($"t")).as[Double].collect().toSeq
    assert(got == Seq(0.75, 0.25, 0.0, 1.0))
  }

  test("dupNgramFrac counts repeated n-grams; short texts clamp to one gram") {
    // "a a a b": 2-grams [a a, a a, a b] -> 1 - 2/3
    val got2 = Seq("a a a b", "a b c d", "", "x").toDF("t")
      .select(TextAnalysis.dupNgramFrac($"t", 2)).as[Double].collect().toSeq
    assert(got2 == Seq(0.333333, 0.0, 0.0, 0.0))
    // "a b a b a b": 3-grams [aba, bab, aba, bab] -> 1 - 2/4
    val got3 = Seq("a b a b a b").toDF("t")
      .select(TextAnalysis.dupNgramFrac($"t", 3)).as[Double].collect().toSeq
    assert(got3 == Seq(0.5))
  }

  test("redactPii scrubs emails, phones and IPv4s with typed placeholders") {
    val got = Seq(
      "mail a.b+c@sub.ex.org now",
      "call 555-010-1234 or 555-010-12345",
      "host 10.0.255.1 up",
      "clean text").toDF("t")
      .select(TextAnalysis.redactPii($"t")).as[String].collect().toSeq
    assert(got(0) == "mail <EMAIL> now")
    // 11-digit tail fails the trailing word boundary only for the 4-digit
    // group; the first number redacts, the second keeps its extra digit
    assert(got(1).startsWith("call <PHONE> or "))
    assert(got(2) == "host <IP> up")
    assert(got(3) == "clean text")
    val counts = Seq("x@y.io and z@w.co 1.2.3.4").toDF("t")
      .select(TextAnalysis.piiEmailCount($"t"), TextAnalysis.piiIpv4Count($"t"))
      .as[(Long, Long)].collect().head
    assert(counts == ((2L, 1L)))
  }

  test("uniqueTokenRatio = distinct/total") {
    val got = Seq("a a b b", "a b c d", "").toDF("t")
      .select(TextAnalysis.uniqueTokenRatio($"t")).as[Double].collect().toSeq
    assert(got == Seq(0.5, 1.0, 0.0))
  }
}
