package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product — the hot
  * loop of similarity search.
  *
  * WHY a custom Expression (SURVEY §7.3 preference order): the
  * higher-order-function form `aggregate(zip_with(a,b,_*_),0d,_+_)`
  * evaluates INTERPRETED (HOFs have no doGenCode) — per element it
  * allocates lambda frames and boxes doubles. This expression compiles
  * into whole-stage codegen as a tight primitive `double` loop. The
  * summation is the SAME strict sequential left fold, so results are
  * bit-identical to the HOF form (and to DuckDB's list_dot_product) —
  * it can replace it under oracle-checked queries.
  *
  * Null semantics: null input array, length mismatch, or any null
  * element → null (matches zip_with/aggregate null propagation).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration surface: either build columns directly ([[GraftFunctions.dot]])
  * or register `graft_dot` for SQL via session extensions
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) /
  * [[GraftFunctions.register]].
  */
object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => ArrayDotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashVotes].getName, "graft_simhash"),
      (args: Seq[Expression]) => args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(b: Int, _) =>
          SimHashVotes(args(0), b)
        case other => throw new IllegalArgumentException(
          s"graft_simhash bits argument must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(p: Int, _) =>
          MinHashSignature(args(0), p)
        case other => throw new IllegalArgumentException(
          s"graft_minhash p argument must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_ngram_hashes"),
      new ExpressionInfo(classOf[CharNgramHashes].getName, "graft_ngram_hashes"),
      (args: Seq[Expression]) => args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
          CharNgramHashes(args(0), n)
        case other => throw new IllegalArgumentException(
          s"graft_ngram_hashes n argument must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_word_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingleHashes].getName, "graft_word_shingle_hashes"),
      (args: Seq[Expression]) => args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
          WordShingleHashes(args(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_word_shingle_hashes k argument must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_sig_agreement"),
      new ExpressionInfo(classOf[ArraySigAgreement].getName, "graft_sig_agreement"),
      (args: Seq[Expression]) => ArraySigAgreement(args(0), args(1))))

  /** Column-level constructor — no registration needed. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ArrayDotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** SimHash of an array of element hashes (see [[SimHashVotes]]). */
  def simhash(hashes: Column, bits: Int): Column = SimHashVotes.simhash(hashes, bits)

  /** MinHash signature of an array of element hashes (see [[MinHashSignature]]). */
  def minhash(hashes: Column, p: Int): Column = MinHashSignature.minhash(hashes, p)

  /** Char-n-gram hashes of a string, computed over the raw UTF-8 bytes
    * (see [[CharNgramHashes]]).
    */
  def ngramHashes(text: Column, n: Int): Column = CharNgramHashes.ngramHashes(text, n)

  /** Word-k-shingle hashes of a string, one byte pass, zero-copy for
    * single-spaced text (see [[WordShingleHashes]]).
    */
  def wordShingleHashes(text: Column, k: Int): Column =
    WordShingleHashes.wordShingleHashes(text, k)

  /** Imperative registration into an existing session (idempotent). */
  def register(spark: SparkSession): Unit = functions.foreach {
    case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
