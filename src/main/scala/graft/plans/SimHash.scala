package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the SimHash vote-fold — the hot loop of
  * SimHash near-dup detection.
  *
  * WHY (same argument as [[ArrayDotProduct]]): the higher-order-function
  * form in `Dedup.simhashOf` folds a `bits`-slot vote array over the
  * element hashes with an inner `bits`-element `transform` PER ELEMENT —
  * O(elements × bits) interpreted lambda frames and boxed longs. This
  * expression runs the identical integer math as a primitive nested loop
  * inside whole-stage codegen, reusing one mutable vote buffer across
  * rows.
  *
  * Semantics (bit-identical to the HOF fold, asserted in SimHashExprSpec):
  * input is the ARRAY OF ELEMENT HASHES (hashing stays composable —
  * xxhash64, md5-based, any long-valued hash); for each hash h and bit b,
  * vote[b] += (h >> b) & 1 == 1 ? +1 : -1; output bit b is set iff
  * vote[b] > 0. A NULL element votes -1 on every bit (the HOF's
  * `when(...).otherwise(-1)` branch evaluates the null comparison to
  * false); a null array yields null; an empty array yields 0L.
  */
case class SimHashVotes(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName bits must be in [1, 64], got $bits")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> (element hashes), got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1L; b += 1 }
      } else {
        val h = hs.getLong(i)
        var b = 0
        while (b < bits) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one vote buffer per operator instance, reused across rows
    val buf = ctx.addMutableState("long[]", "simhashVotes", v => s"$v = new long[$bits];")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |java.util.Arrays.fill($buf, 0, $bits, 0L);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    for (int $b = 0; $b < $bits; $b++) $buf[$b] -= 1L;
         |  } else {
         |    final long $h = $a.getLong($i);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      $buf[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($buf[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashVotes =
    copy(child = newChild)
}

object SimHashVotes {
  /** Column-level constructor — `hashes` must be array<bigint>. */
  def simhash(hashes: Column, bits: Int): Column =
    GraftSqlBridge.column(SimHashVotes(GraftSqlBridge.expression(hashes), bits))
}
