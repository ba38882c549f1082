package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped embedding analytics: per-label centroids and intra-class
  * cosine cohesion — the "how tight are my clusters / is this label
  * column garbage" diagnostics of an embedding pipeline.
  *
  * Determinism contract: components are integerized
  * (`floor(x · 1e7)`) before any aggregation, so centroid numerators
  * are EXACT integer sums (order-independent — a float sum would vary
  * with partial-aggregation order and engine). The per-row cosine then
  * folds in fixed index order over exact inputs, and the per-label
  * cohesion mean is again an exact integer sum of floor-scaled
  * cosines. Every double any engine computes here has identical
  * operands in identical order.
  *
  * Scale shape: the positional explode is the one real shuffle
  * (dims × rows, keyed (label, pos) — uniform), the centroid table is
  * tiny and broadcast back, cohesion is a final map-side-partial agg
  * on the label key. No driver-side vectors, no collect.
  */
object VectorAgg {

  private val CompScale = 10000000L // 1e7: float32 mantissa fits with room
  private val CosScale = 1000000L

  /** Integerized component explode: (label, pos, vm). */
  private def explodeComponents(
      df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "comp")))
      .select(col("label"), col("pos"),
        floor(col("comp").cast("double") * CompScale).cast("long").as("vm"))

  /** Per-label centroid NUMERATORS: (label, n_vecs, cs: array<long>)
    * where cs[i] = Σ floor(x_i·1e7) in component order. Exact integers;
    * centroid_i = cs[i] / (n_vecs · 1e7).
    */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val nPerLabel = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    explodeComponents(df, labelCol, vecCol)
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("vm")).as("s"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s")).as("cs"))
      .join(nPerLabel, "label")
      .select(col("label"), col("n_vecs"), col("cs"))
  }

  /** Intra-class cohesion: mean (floor-scaled) cosine of each vector to
    * its label centroid. Output: (label, n_vecs, cohesion_m) with
    * cohesion_m = Σ floor(cos·1e6) / n — an exact integer ratio.
    */
  def intraCosine(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val cent = centroids(df, labelCol, vecCol)
    val vd = transform(col(vecCol), x => x.cast("double"))
    val cd = transform(col("cs"), x => x.cast("double"))
    val dot = aggregate(zip_with(vd, cd, _ * _), lit(0.0), _ + _)
    val nv = sqrt(aggregate(transform(vd, x => x * x), lit(0.0), _ + _))
    val nc = sqrt(aggregate(transform(cd, x => x * x), lit(0.0), _ + _))
    val cos = when(nv === 0 || nc === 0, lit(0.0)).otherwise(dot / (nv * nc))
    df.select(col(labelCol).as("label"), col(vecCol).cast("array<double>").as(vecCol))
      .join(broadcast(cent), "label")
      .select(col("label"), col("n_vecs"),
        floor(cos * CosScale).cast("long").as("cos_m"))
      .groupBy(col("label"), col("n_vecs"))
      .agg((sum(col("cos_m")).cast("double") / col("n_vecs") / CosScale.toDouble)
        .as("cohesion"))
      .select(col("label"), col("n_vecs"), round(col("cohesion"), 6).as("cohesion"))
  }
}
