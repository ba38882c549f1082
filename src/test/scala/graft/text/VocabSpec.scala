package graft.text

import graft.SparkTestBase

class VocabSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a a b b c"),
    (2L, "a b c d"),
    (3L, "x y a")).toDF("doc_id", "text")

  test("vocab ids are dense in (count desc, token) order") {
    val got = Vocab.build(docs, "text", vocabSize = 3)
      .as[(String, Long, Long)].collect().sortBy(_._2)
    // counts: a=5 b=3 c=2 d=1 x=1 y=1 → top3 = a(1), b(2), c(3)
    assert(got.toSeq == Seq(("a", 1L, 5L), ("b", 2L, 3L), ("c", 3L, 2L)))
  }

  test("count ties break by token asc") {
    val d = Seq((1L, "z q z q m")).toDF("doc_id", "text")
    val got = Vocab.build(d, "text", vocabSize = 3)
      .as[(String, Long, Long)].collect().sortBy(_._2)
    // z=2 q=2 m=1 → q before z on the tie
    assert(got.toSeq == Seq(("q", 1L, 2L), ("z", 2L, 2L), ("m", 3L, 1L)))
  }

  test("coverage counts OOV exactly and id_sum pins assignment") {
    val vocab = Vocab.build(docs, "text", vocabSize = 3)
    val got = Vocab.coverage(docs, vocab, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc1: 6 toks, 0 oov, ids 1+1+1+2+2+3 = 10
    assert(got(1L) == (1L, 6L, 0L, 0L, 10L))
    // doc2: 4 toks, 1 oov (d), ppm = 250000, ids 1+2+3 = 6
    assert(got(2L) == (2L, 4L, 1L, 250000L, 6L))
    // doc3: 3 toks, 2 oov (x,y), ppm = 666666, ids 1
    assert(got(3L) == (3L, 3L, 2L, 666666L, 1L))
  }
}
