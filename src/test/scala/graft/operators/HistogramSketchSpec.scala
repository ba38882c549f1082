package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HistogramSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val W = 10L
  private val data: Seq[(Long, Long)] = // (part, value), skewed + negatives
    (0L until 400L).map(i => (i % 5) -> ((i * i) % 357 - 30))

  test("parts merged across any part split equal the whole-data sketch") {
    val df = data.toDF("pt", "v")
    val whole = HistogramSketch.parts(df.withColumn("pt", lit(0L)), "pt", "v", W)
      .groupBy("bin").agg(sum($"n").as("n"))
      .as[(Long, Long)].collect().toMap
    val merged = HistogramSketch.parts(df, "pt", "v", W)
      .groupBy("bin").agg(sum($"n").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(merged == whole && merged.values.sum == 400L)
  }

  test("quantile estimate lands within width/2 of the exact percentile") {
    val df = data.toDF("pt", "v")
    val sketch = HistogramSketch.parts(df, "pt", "v", W)
    val est = HistogramSketch.quantiles(sketch, W, Seq(10, 50, 90, 99))
      .as[(Int, Long)].collect().toMap
    val sorted = data.map(_._2).sorted
    for ((p, e) <- est) {
      val exact = sorted((math.ceil(p * sorted.size / 100.0) - 1).toInt.max(0))
      assert(math.abs(e - exact) <= W / 2, s"p$p: est=$e exact=$exact")
    }
  }

  test("percentile of a pre-filtered part range uses only those parts") {
    val df = data.toDF("pt", "v")
    val sketch = HistogramSketch.parts(df, "pt", "v", W).filter($"pt" <= 1L)
    val est = HistogramSketch.quantiles(sketch, W, Seq(100)).as[(Int, Long)].head()
    val exactMax = data.filter(_._1 <= 1L).map(_._2).max
    assert(math.abs(est._2 - exactMax) <= W / 2)
  }
}
