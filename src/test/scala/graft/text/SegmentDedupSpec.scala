package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SegmentDedupSpec extends SparkTestBase {
  import spark.implicits._

  // width=2 segments; "a b" appears in docs 1, 2, 3 — only doc 1 keeps it
  private def docs = Seq(
    (1L, "a b c d"),         // segs: "a b", "c d"
    (2L, "a b x"),           // segs: "a b" (dup), "x"
    (3L, "a b"),             // seg: "a b" (dup) → everything dropped
    (4L, "c d c d")          // segs: "c d" (dup of doc1), "c d" (dup)
  ).toDF("doc_id", "text")

  test("first occurrence by (doc, position) wins globally; counts are exact") {
    val out = SegmentDedup.dedupSegments(docs, "doc_id", "text", width = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_kept").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 1L, 0L), (4L, 2L, 0L)))
  }

  test("fingerprint is the md5 of the surviving segments in document order") {
    val out = SegmentDedup.dedupSegments(docs, "doc_id", "text", width = 2)
      .select("doc_id", "fp").as[(Long, String)].collect().toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) == m("a b c d"))
    assert(out(2L) == m("x"))
    assert(out(3L) == m(""))  // all segments deduped away
    assert(out(4L) == m(""))
  }

  test("trailing partial segment keeps the remainder words; whitespace is normalized") {
    val d = Seq((1L, "  p  q   r ")).toDF("doc_id", "text")
    val segs = SegmentDedup.segments(d, "doc_id", "text", width = 2)
      .orderBy("idx").select("idx", "seg").as[(Int, String)].collect()
    assert(segs.toSeq == Seq((0, "p q"), (1, "r")))
  }

  test("within one doc a repeated segment keeps only the earliest position") {
    val d = Seq((7L, "z z z z")).toDF("doc_id", "text")
    val out = SegmentDedup.dedupSegments(d, "doc_id", "text", width = 2)
      .select("n_segs", "n_kept").as[(Long, Long)].head()
    assert(out == ((2L, 1L)))
  }
}
