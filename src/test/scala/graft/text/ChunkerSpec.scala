package graft.text

import graft.SparkTestBase

class ChunkerSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "abcdefghij"),          // 10 chars → 4+4+2 at n=4
    (2L, "xyz"),                 // shorter than one chunk
    (3L, ""),                    // empty survives
    (4L, "exactly8"),            // exact multiple: no ragged tail
    (5L, "héllo wörld — unicode £ text") // multi-byte chars count as chars
  ).toDF("id", "text")

  test("chunks are fixed-size with a ragged tail; round trip is identity") {
    val chunks = Chunker.chunk(docs, "id", "text", 4)
    val byDoc = chunks.as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byDoc(1L) == Seq("abcd", "efgh", "ij"))
    assert(byDoc(2L) == Seq("xyz"))
    assert(byDoc(3L) == Seq(""))
    assert(byDoc(4L) == Seq("exac", "tly8"))
    val back = Chunker.reassemble(chunks, "id", "chunk_ix", "chunk")
      .as[(Long, String)].collect().toMap
    val orig = docs.as[(Long, String)].collect().toMap
    assert(back == orig)
  }

  test("round trip is identity at several chunk sizes and partitionings") {
    for (n <- Seq(1, 3, 7, 1000)) {
      val back = Chunker.reassemble(
          Chunker.chunk(docs.repartition(3), "id", "text", n),
          "id", "chunk_ix", "chunk")
        .as[(Long, String)].collect().toMap
      assert(back == docs.as[(Long, String)].collect().toMap, s"n=$n")
    }
  }
}
