package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NestSpec extends SparkTestBase {
  import spark.implicits._

  test("children pack into sorted arrays; childless parents get empty arrays") {
    val parent = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pid", "name")
    val child = Seq((1L, 2L, 20L), (1L, 1L, 10L), (2L, 1L, 30L))
      .toDF("cid", "seq", "v")
    val got = Nest.assemble(parent, child, "pid", "cid", Seq("seq", "v"))
      .select($"pid", $"name",
        expr("transform(items, x -> concat(x.seq, '-', x.v))").as("sig"))
      .as[(Long, String, Seq[String])].collect().toSet
    assert(got == Set(
      (1L, "a", Seq("1-10", "2-20")),
      (2L, "b", Seq("1-30")),
      (3L, "c", Seq())))
  }

  test("array order follows struct field precedence, not input order") {
    val parent = Seq(Tuple1(1L)).toDF("pid")
    val child = Seq((1L, 3L, "z"), (1L, 1L, "y"), (1L, 2L, "x"))
      .toDF("cid", "seq", "s")
    val got = Nest.assemble(parent, child, "pid", "cid", Seq("seq", "s"))
      .select(expr("transform(items, x -> x.s)").as("ss"))
      .as[Seq[String]].head()
    assert(got == Seq("y", "x", "z"))
  }

  test("same-named keys and colliding items column are rejected") {
    val p = Seq(Tuple1(1L)).toDF("k")
    intercept[IllegalArgumentException] {
      Nest.assemble(p, Seq((1L, 1L)).toDF("k", "v"), "k", "k", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Nest.assemble(p.withColumn("items", lit(1)),
        Seq((1L, 1L)).toDF("c", "v"), "k", "c", Seq("v"))
    }
  }
}
