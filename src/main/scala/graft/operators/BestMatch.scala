package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal best match: pairs (a, b) where b is a's strongest
  * neighbor AND a is b's — the mutual-nearest-neighbor pairing that
  * seeds entity resolution, record linkage, and translation-pair
  * mining (mutual best is the standard high-precision filter on a
  * noisy similarity graph).
  *
  * One argmax aggregation per node over the weighted neighbor list
  * (max-struct, ties toward the smaller neighbor id — deterministic),
  * then a self-equi-join of the best-edge frame on the reversed pair.
  * O(|E|) with uniform node keys; no windows over raw edges.
  */
object BestMatch {

  /** (id_a, id_b, w) with id_a < id_b, where each is the other's
    * unique best neighbor by (weight desc, id asc). `edges` are
    * undirected weighted pairs; parallel edges collapse to max weight.
    */
  def reciprocal(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String): DataFrame = {
    val fwd = edges.select(col(srcCol).as("u"), col(dstCol).as("v"),
      col(wCol).cast("long").as("w"))
    val sym = fwd.union(fwd.select(col("v").as("u"), col("u").as("v"), col("w")))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(max(col("w")).as("w"))
    // argmax by (w, −v): heaviest edge, smallest neighbor id on ties
    val best = sym
      .groupBy(col("u"))
      .agg(max(struct(col("w"), (-col("v")).as("nv"))).as("m"))
      .select(col("u"), (-col("m.nv")).as("v"), col("m.w").as("w"))
    best.as("x").join(best.as("y"),
        col("x.u") === col("y.v") && col("x.v") === col("y.u") &&
          col("x.u") < col("y.u"))
      .select(col("x.u").as("id_a"), col("x.v").as("id_b"),
        col("x.w").as("w"))
  }
}
