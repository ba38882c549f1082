package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-cell radius self-join (spatial near-pair search): find all
  * point pairs within integer euclidean distance `radius`, without the
  * all-pairs cross join. Each point lands in a square cell of side
  * `radius`; a pair within the radius is then guaranteed to sit in the
  * same or an adjacent cell, so candidates come from one equi hash
  * join of home-cell points against 3×3-neighborhood probe copies —
  * the same bucket-prefilter-then-exact-verify shape as the MinHash
  * LSH pipeline (Dedup.lshCandidatePairs), but with a geometric
  * guarantee instead of a probabilistic one: recall is exactly 1.
  *
  * Why this scales to 100 TB: the probe side is a constant 9× blowup
  * (explode of a 9-element literal array), the join key is a uniform
  * grid cell, and the exact distance check runs inside the join's
  * codegen stage. A dense cell degrades to that cell's local pair
  * count only — never to a global cross join. Coordinates and the
  * radius are integers, so the distance-squared comparison is exact on
  * any engine.
  */
object GeoGrid {

  /** All unordered pairs of `points` (idCol, xCol, yCol — nonnegative
    * integer coordinates) with squared euclidean distance ≤ radius².
    * Output: id_a, id_b (id_a < id_b), d2. Exactly-once: a pair joins
    * only where the LEFT side's home cell equals ONE of the RIGHT
    * side's nine probe cells, and the id order filter keeps a single
    * orientation.
    */
  def radiusPairs(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    val pts = points.select(col(idCol).as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    // home cell via integer `div` (coordinates are nonnegative so
    // truncating division IS floor division — no engine divergence)
    val home = pts
      .withColumn("cx", expr(s"x div $radius"))
      .withColumn("cy", expr(s"y div $radius"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val probes = home
      .select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        explode(offsets).as("o"), col("cx"), col("cy"))
      .select(col("id_b"), col("xb"), col("yb"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
    home
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        col("cx"), col("cy"))
      .join(probes, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("d2") <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("d2"))
  }
}
