package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the MinHash signature fold — the hot
  * loop of MinHash+LSH near-dup detection.
  *
  * The HOF form (`Dedup.minhashSignatureHof`) folds a p-slot running-min
  * array over the element hashes with an inner p-element
  * `transform(sequence(...), i => xxhash64(i, h))` PER ELEMENT —
  * O(elements × p) interpreted lambda frames, boxed longs, and a fresh
  * p-array allocation per step. This expression runs the identical
  * integer math as a primitive nested loop inside whole-stage codegen:
  * signature[i] = min over hashes h of xxhash64(i, h), where
  * xxhash64(i, h) = XXH64.hashLong(h, XXH64.hashInt(i, 42)) — exactly
  * Spark's left-fold multi-argument xxhash64, so results are
  * bit-identical to the HOF form (asserted in MinHashExprSpec). The
  * per-slot seeds XXH64.hashInt(i, 42) are precomputed once per
  * operator.
  *
  * Null semantics (matching the HOF): null array → null; a NULL element
  * hash contributes xxhash64(i, null) = hashInt(i, 42) = the slot seed
  * (null children leave the running hash untouched in Spark's
  * xxhash64); an empty array yields the all-Long.MaxValue init vector.
  */
case class MinHashSignature(child: Expression, p: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if p >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName p must be >= 1, got $p")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> (element hashes), got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(p)(i => XXH64.hashInt(i, 42L))

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val acc = Array.fill(p)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (hs.isNullAt(j)) {
        var i = 0
        while (i < p) { acc(i) = math.min(acc(i), seeds(i)); i += 1 }
      } else {
        val h = hs.getLong(j)
        var i = 0
        while (i < p) {
          val m = XXH64.hashLong(h, seeds(i))
          if (m < acc(i)) acc(i) = m
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val seedsVar = ctx.addMutableState("long[]", "mhSeeds",
      v => s"$v = new long[$p]; for (int i = 0; i < $p; i++) $v[i] = $xxh.hashInt(i, 42L);")
    val buf = ctx.addMutableState("long[]", "mhAcc", v => s"$v = new long[$p];")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      s"""
         |final int $n = $a.numElements();
         |java.util.Arrays.fill($buf, 0, $p, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) {
         |    for (int $i = 0; $i < $p; $i++) {
         |      if ($seedsVar[$i] < $buf[$i]) $buf[$i] = $seedsVar[$i];
         |    }
         |  } else {
         |    final long $h = $a.getLong($j);
         |    for (int $i = 0; $i < $p; $i++) {
         |      final long $m = $xxh.hashLong($h, $seedsVar[$i]);
         |      if ($m < $buf[$i]) $buf[$i] = $m;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($buf);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-level constructor — `hashes` must be array<bigint>. */
  def minhash(hashes: Column, p: Int): Column =
    GraftSqlBridge.column(MinHashSignature(GraftSqlBridge.expression(hashes), p))
}
