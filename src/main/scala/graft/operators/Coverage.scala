package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection: pick `rounds` documents, each
  * round taking the one covering the most not-yet-covered elements
  * (ties toward the smallest id) — the classic (1−1/e)-approximate
  * subset-selection primitive for corpus curation ("which k documents
  * cover the most distinct n-grams/topics/entities").
  *
  * Greedy is INHERENTLY sequential in the round dimension: each pick
  * depends on the previous cover. Per round everything is distributed
  * — one anti-join of the element table against the covered set plus
  * one count aggregation — and only the single winning (id, gain) row
  * ever reaches the driver (the q16 span-probe convention: a bounded
  * driver action per round, never a data collect). The covered set is
  * checkpointed per round, the usual iterative-lineage discipline.
  * Rounds are a constant; the SQL oracle unrolls them exactly.
  */
object Coverage {

  /** Greedy max-coverage picks. `elems` must be (idCol, elCol) DISTINCT
    * membership pairs. Output: round, id, gain (newly covered
    * elements), covered_total (running cover size) — one row per round,
    * stopping early if nothing new can be covered.
    */
  def greedySelect(elems: DataFrame, idCol: String, elCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = elems.sparkSession
    import spark.implicits._
    val e = elems.select(col(idCol).cast("long").as("id"), col(elCol).as("el"))
      .persist()
    var covered: DataFrame = null
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var cum = 0L
    var done = false
    for (r <- 1 to rounds if !done) {
      val rem = if (covered == null) e else e.join(covered, Seq("el"), "left_anti")
      val win = rem.groupBy(col("id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id")).limit(1).collect()
      if (win.isEmpty) done = true
      else {
        val id = win(0).getLong(0)
        val gain = win(0).getLong(1)
        cum += gain
        picks += ((r.toLong, id, gain, cum))
        val newCov = e.filter(col("id") === id).select(col("el"))
        val prev = covered
        covered = (if (covered == null) newCov else covered.union(newCov))
          .distinct().localCheckpoint(eager = true)
        // the new checkpoint has materialized; release the previous
        // round's blocks so repeated runs in a long-lived session don't
        // accumulate one checkpointed frame per round
        if (prev != null) prev.unpersist()
      }
    }
    e.unpersist()
    picks.toSeq.toDF("round", "id", "gain", "covered_total")
  }
}
