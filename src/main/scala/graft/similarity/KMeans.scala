package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic k-means (Lloyd) over an embedding column, in EXACT
  * integer arithmetic — corpus clustering whose every step an oracle
  * can replay bit-for-bit: components floor to 1e7-scaled BIGINTs
  * (the q69 convention), distances are integer squared-L2 sums,
  * argmin ties break on the lowest cluster id, and centroid updates
  * are elementwise FLOOR division of exact sums (explicit −1
  * correction — Spark's `div` truncates where other engines floor).
  * Initial centroids are the k vectors with the smallest ids; an
  * emptied cluster keeps its previous centroid.
  *
  * Scale shape per iteration: centroids (k rows) broadcast to a
  * map-side distance computation — the only shuffles are the argmin
  * aggregation on the vector id and the (cluster, component)
  * centroid-update aggregation. Vectors are integerized and persisted
  * ONCE; no driver-side math beyond orchestration.
  */
object KMeans {

  private val CompScale = 10000000L // matches VectorAgg's 1e7

  /** (idCol, cluster) after `iterations` assignment steps with
    * centroid updates between them.
    */
  def assign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int): DataFrame = {
    require(k >= 1 && iterations >= 1, "k and iterations must be >= 1")
    val iv = df.select(col(idCol).cast("long").as("__id"),
        transform(col(vecCol), x => floor(x.cast("double") * CompScale).cast("long"))
          .as("__v"))
      .persist()

    var centroids = iv.orderBy(col("__id")).limit(k)
      .select(col("__id").as("cluster"), col("__v").as("__cv"))

    def assignTo(cents: DataFrame): DataFrame =
      iv.crossJoin(broadcast(cents))
        .withColumn("__dist", aggregate(
          zip_with(col("__v"), col("__cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
        .groupBy(col("__id"))
        .agg(min(struct(col("__dist"), col("cluster"))).getField("cluster").as("cluster"))

    var assigned = assignTo(centroids)
    for (_ <- 1 until iterations) {
      val members = assigned.join(iv, "__id")
      val sums = members
        .select(col("cluster"), posexplode(col("__v")).as(Seq("__pos", "__vm")))
        .groupBy(col("cluster"), col("__pos"))
        .agg(sum(col("__vm")).as("__s"), count(lit(1)).as("__n"))
        // elementwise floor(Σx / n): explicit floor, not div-truncation
        .withColumn("__m",
          expr("(__s div __n) + (CASE WHEN __s % __n < 0 THEN -1 ELSE 0 END)"))
      val updated = sums.groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
          x => x.getField("__m")).as("__ncv"))
      centroids = centroids.join(updated, Seq("cluster"), "left")
        .select(col("cluster"), coalesce(col("__ncv"), col("__cv")).as("__cv"))
      assigned = assignTo(centroids)
    }
    assigned.select(col("__id").as(idCol), col("cluster"))
  }
}
