package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  // 8-dim vectors — would have broken the old hardcoded dim=64 silently.
  private def vecs8 = Seq(
    (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (3L, Array(-1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with the query itself first") {
    val q = vecs8.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val got = Similarity.bruteForceTopK(vecs8, "vec_id", "embedding", q, 3)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L))
  }

  test("lshTopK works on non-64-dim vectors (dim inference regression)") {
    val q = vecs8.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val got = Similarity.lshTopK(vecs8, "vec_id", "embedding", q, k = 4,
        bits = 8, maxHamming = 8) // maxHamming=bits → no filtering, pure dim test
      .select($"vec_id").as[Long].collect().toSeq
    assert(got.take(2) == Seq(0L, 1L))
  }

  test("ANN candidate set contains the brute-force top-k on driver embeddings") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val q = emb.filter($"vec_id" === 1).select($"embedding".as("qvec"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select($"vec_id").as[Long].collect().toSet
    val ann = Similarity.lshTopK(emb, "vec_id", "embedding", q, k = 50,
        bits = 12, maxHamming = 6)
      .select($"vec_id").as[Long].collect().toSet
    assert(brute.subsetOf(ann),
      s"ANN candidates missing ${brute.diff(ann)} of brute-force top-5")
  }

  test("dimOf infers the embedding width from data") {
    assert(Similarity.dimOf(vecs8, "embedding") == 8)
    assert(Similarity.dimOf(Tables.embeddings(spark, sfSmoke), "embedding") == 64)
  }

  test("cosineNearDupPairs finds planted high-cosine pairs and nothing else") {
    val dim = 16
    def unit(i: Int) = Array.tabulate(dim)(j => if (j == i) 1f else 0f)
    val nearly = Array.tabulate(dim)(j =>
      if (j == 0) 1f else if (j == 1) 0.05f else 0f) // cos(v0, nearly) ≈ 0.9988
    val vecs = Seq(
      (0L, unit(0)), (1L, nearly), (2L, unit(2)), (3L, unit(3))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        threshold = 0.95, bits = 16, maxHamming = 7, dim = dim)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("cosineNearDupPairs validates the ball against the threshold") {
    val df = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    // defaults (64, 6) cannot guarantee recall at cos 0.8 (E[h] ≈ 13):
    // the inconsistency must fail fast, not silently drop pairs
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.8)
    }
    assert(e.getMessage.contains("maxHamming"))
    // stating the real recall target re-admits the loose threshold
    assert(Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.8,
      recallCosine = 0.99).columns.toSeq == Seq("id_a", "id_b", "cos"))
    // a recall target BELOW the threshold is a caller bug
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.9,
        recallCosine = 0.5)
    }
  }

  test("knnJoin returns each query's exact top-k with itself first") {
    val q = vecs8.filter($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = Similarity.knnJoin(vecs8, "vec_id", "embedding", q, 2)
      .orderBy($"qid", $"rk")
      .select($"qid", $"vec_id", $"rk").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 1L), (1L, 0L, 2L)))
  }

  test("IVF index probe prunes to the probed cells and finds the query vector") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", path, nCentroids = 16)

    val qv = emb.filter($"vec_id" === 3).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val got = Similarity.queryIvfIndex(spark, path, "vec_id", "embedding",
      qv, k = 5, nCentroids = 16, nProbe = 3)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_cell"))
    // the query vector's own cell is always probed → itself ranks first
    val top = got.select($"vec_id").as[Long].collect()
    assert(top.headOption.contains(3L))
    // probing all cells = exact brute force
    val all = Similarity.queryIvfIndex(spark, path, "vec_id", "embedding",
      qv, k = 5, nCentroids = 16, nProbe = 16)
      .select($"vec_id").as[Long].collect().toSeq
    val q = emb.filter($"vec_id" === 3).select($"embedding".as("qvec"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select($"vec_id").as[Long].collect().toSeq
    assert(all == brute)
  }

  test("hammingBall enumerates Σ C(bits,r) distinct signatures") {
    val ball = Similarity.hammingBall(0b1010L, bits = 12, maxHamming = 2)
    assert(ball.length == 1 + 12 + 66)
    assert(ball.distinct.length == ball.length)
    assert(ball.forall(s => java.lang.Long.bitCount(s ^ 0b1010L) <= 2))
  }

  test("LSH index probe prunes partitions and matches the scan-based ANN") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val path = java.nio.file.Files.createTempDirectory("graft-lshidx").toString + "/idx"
    Similarity.writeLshIndex(emb, "vec_id", "embedding", path, bits = 12)

    val qv = emb.filter($"vec_id" === 1).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val got = Similarity.queryLshIndex(spark, path, "vec_id", "embedding",
      qv, k = 5, bits = 12, maxHamming = 2)

    // partition pruning visible in the scan (sig_bucket is a partition col)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sig_bucket"))

    // same result as the scan-based ANN at the same probe radius
    val q = emb.filter($"vec_id" === 1).select($"embedding".as("qvec"))
    val scanned = Similarity.lshTopK(emb, "vec_id", "embedding", q, k = 5,
        bits = 12, maxHamming = 2)
      .select($"vec_id").as[Long].collect().toSeq
    val indexed = got.select($"vec_id").as[Long].collect().toSeq
    assert(indexed == scanned && indexed.nonEmpty)
  }

  test("streamed index appends ≡ batch build; probe prunes and stays queryable mid-ingest") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val dim = Similarity.dimOf(emb, "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lshstream")
    val spool = tmp.resolve("spool").toString
    val streamed = tmp.resolve("streamed").toString
    val batch = tmp.resolve("batch").toString
    val qv = emb.filter($"vec_id" === 1).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray

    Similarity.writeLshIndex(emb, "vec_id", "embedding", batch, bits = 6)
    def probe(path: String) =
      Similarity.queryLshIndex(spark, path, "vec_id", "embedding",
        qv, k = 5, bits = 6, maxHamming = 1)

    // two deliveries on one checkpoint; probe after EACH — the index is
    // queryable between deliveries, then equals the batch build
    for (parity <- 0 to 1) {
      emb.filter($"vec_id" % 2 === parity).write.mode("append").parquet(spool)
      val stream = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 100000).parquet(spool)
      Similarity.appendLshIndexStream(stream, "embedding", streamed,
        tmp.resolve("ckpt").toString, dim, bits = 6).awaitTermination()
      assert(probe(streamed).collect().nonEmpty)
    }
    val got = probe(streamed)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sig_bucket"))
    assert(got.as[(Long, Double)].collect().toSeq ==
      probe(batch).as[(Long, Double)].collect().toSeq)
  }
}
