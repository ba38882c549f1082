package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkTestBase {
  import spark.implicits._

  // hot key 7: 200 rows; the rest sparse. Duplicate dim rows for key 3
  // prove multiplicity preservation (1 big row × 2 dim rows = 2 out).
  private val big = ((1L to 200L).map(i => (7L, i)) ++ Seq((3L, 900L), (5L, 901L)))
    .toDF("k", "payload")
  private val dim = Seq((7L, "hot"), (3L, "a"), (3L, "b"), (9L, "unmatched"))
    .toDF("k", "attr")

  test("result equals the plain inner join, multiplicities included") {
    for (r <- Seq(1, 4, 16)) {
      val salted = SaltedJoin.inner(big, dim, Seq("k"), r)
        .as[(Long, Long, String)].collect().sorted.toSeq
      val plain = big.join(dim, Seq("k"))
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(salted == plain, s"replication=$r")
    }
  }

  test("hot-key rows actually spread across salts") {
    val salts = big.filter($"k" === 7L)
      .withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(8L)).cast("int"))
      .select($"__salt").distinct().count()
    assert(salts >= 6, s"hot key used only $salts of 8 salts")
  }

  test("works on composite keys") {
    val b2 = Seq((1L, "x", 10L), (1L, "y", 20L)).toDF("k1", "k2", "v")
    val d2 = Seq((1L, "x", "m")).toDF("k1", "k2", "a")
    val out = SaltedJoin.inner(b2, d2, Seq("k1", "k2"), 4)
      .as[(Long, String, Long, String)].collect().toSeq
    assert(out == Seq((1L, "x", 10L, "m")))
  }
}
