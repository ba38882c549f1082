package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by key salting — for the join where the BIG
  * side has hot keys and the other side is too large (or the planner
  * too conservative) to broadcast: a plain shuffle join would send a
  * hot key's entire row set to ONE reducer. Salting splits each key's
  * rows across `replication` sub-keys (a deterministic row-identity
  * hash, same device as [[SaltedAgg]]), and replicates the other
  * side once per salt, so the join runs on (key, salt) — hot keys
  * spread over `replication` reducers at the cost of an other-side
  * blow-up of exactly ×replication.
  *
  * Inner-join multiplicity is preserved exactly: every big row gets
  * ONE salt, and the replicated side carries each original row once
  * per salt value, so each matching pair meets exactly once. (AQE's
  * skew-join handles sort-merge cases adaptively; this operator is
  * the explicit, planner-independent form, and the one that also
  * covers grouped/bucketed downstream shapes AQE won't touch.)
  */
object SaltedJoin {

  /** Inner equi-join of `big` and `small` on `keyCols`, spread over
    * `replication` salts. Result ≡ big ⋈ small (same rows, same
    * multiplicities), column order: big's then small's non-key.
    */
  def inner(
      big: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      replication: Int): DataFrame = {
    require(replication >= 1, "replication must be >= 1")
    require(keyCols.nonEmpty, "need join keys")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(replication.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(replication - 1))))
    salted.join(replicated, keyCols :+ "__salt").drop("__salt")
  }
}
