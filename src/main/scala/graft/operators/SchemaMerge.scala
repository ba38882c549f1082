package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-evolution union: merge table drops whose schemas drifted
  * (columns added/removed over time) into one frame — align by
  * column NAME, null-fill what a drop never had, and tag provenance.
  * The "read three years of a slowly-growing table as one" primitive.
  *
  * Row-local (Spark's unionByName with allowMissingColumns); no
  * shuffle is introduced — the union is a plan-level concat and each
  * input keeps its own scan/pushdown.
  */
object SchemaMerge {

  /** Union of (sourceTag, frame) pairs aligned by column name; the
    * output carries every column seen anywhere plus `__source`.
    */
  def unionEvolved(sources: Seq[(String, DataFrame)]): DataFrame = {
    require(sources.nonEmpty, "no sources to merge")
    sources.map { case (tag, df) => df.withColumn("__source", lit(tag)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
