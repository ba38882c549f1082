package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native char-n-gram hasher: xxhash64 of every length-n character
  * window of a string, computed DIRECTLY over the UTF-8 bytes — no gram
  * strings are ever materialized. Each value is bit-identical to
  * `xxhash64(substr(text, i, n))` (same bytes, same seed 42), because
  * UTF-8 char windows are contiguous byte ranges; only the multiset
  * shape differs (duplicate grams are kept — irrelevant to the MinHash
  * consumer, whose per-slot min is duplicate-insensitive, and asserted
  * set-equal to the string path in NgramHashSpec).
  *
  * This is what makes the character-n-gram Jaccard dedup family
  * scan-speed: the HOF path (`charShingles` → `transform(_, xxhash64)`)
  * allocates ~numChars strings per row and evaluates interpreted;
  * measured 5× slower end-to-end on the q41 pipeline.
  *
  * Clamp convention matches [[graft.dedup.Dedup.charShingles]]: windows
  * start at chars 1..max(numChars-n+1, 1); a text shorter than n
  * contributes its full remainder (the empty string hashes to
  * xxhash64("")).
  */
case class CharNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName n must be >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "graft_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    NgramHash.hashGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.NgramHash.hashGrams($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

/** Static helper shared by interpreted eval and generated code (objects
  * compile to static forwarders, so codegen calls it directly).
  */
object NgramHash {

  def hashGrams(s: UTF8String, n: Int): UnsafeArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    // char-start byte offsets (UTF-8 chars are contiguous byte ranges)
    var chars = 0
    var i = 0
    val starts = new Array[Int](numBytes + 1)
    while (i < numBytes) {
      starts(chars) = i
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
      chars += 1
    }
    starts(chars) = numBytes
    val count = math.max(chars - n + 1, 1)
    val out = new Array[Long](count)
    var g = 0
    while (g < count) {
      val sb = if (g < chars) starts(g) else numBytes
      val eb = if (g + n <= chars) starts(g + n) else numBytes
      out(g) = XXH64.hashUnsafeBytes(base, offset + sb, eb - sb, 42L)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object CharNgramHashes {
  /** Column-level constructor. */
  def ngramHashes(text: Column, n: Int): Column =
    GraftSqlBridge.column(CharNgramHashes(GraftSqlBridge.expression(text), n))
}
