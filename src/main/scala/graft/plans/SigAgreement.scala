package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native MinHash signature-agreement estimator: the fraction of equal
  * slots between two signatures — the verification PREFILTER that runs
  * once per LSH candidate pair. At char-n-gram granularity a corpus
  * with high baseline similarity produces millions of candidate pairs,
  * so the interpreted HOF form (zip_with + aggregate, p boxed compares
  * per pair) dominates the whole near-dup pipeline; this expression is
  * p primitive compares inside whole-stage codegen.
  *
  * Bit-identical to `Dedup.signatureAgreementHof` on non-empty inputs
  * (asserted in SigAgreementSpec): equal-slot count over the zip of the
  * two arrays (a missing or null slot counts 0), divided by the LEFT
  * array's length as a double. Null array → null. Sole deliberate
  * deviation: an EMPTY left array yields null, where the HOF's 0/0
  * Divide throws under ANSI mode — a prefilter should never abort the
  * pipeline on a degenerate row.
  */
case class ArraySigAgreement(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_sig_agreement"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // empty left array → null (the HOF's 0/0 goes through Spark's
    // null-on-zero Divide)
    if (x.numElements() == 0) return null
    val n = math.min(x.numElements(), y.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / x.numElements()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |  int $eq = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) $eq++;
         |  }
         |  ${ev.value} = ((double) $eq) / $a.numElements();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySigAgreement =
    copy(left = newLeft, right = newRight)
}

object ArraySigAgreement {
  /** Column-level constructor. */
  def sigAgreement(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ArraySigAgreement(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
