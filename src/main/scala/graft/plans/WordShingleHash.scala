package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-k-shingle hasher: xxhash64 of every k-token window of a
  * string, computed in ONE byte pass — no token array, no shingle
  * strings, no interpreted lambda frames. Each value is bit-identical
  * to the HOF path `xxhash64(concat_ws(" ", slice(split(trim(text),
  * "\\s+"), i, k)))` (seed 42), including its edge conventions:
  *
  *  - trim() strips 0x20 only (not tabs/newlines);
  *  - split("\\s+") with Spark's limit −1 keeps leading AND trailing
  *    empty tokens produced by boundary whitespace runs; "" yields the
  *    single empty token (whose lone shingle hashes the empty string);
  *  - shingle windows start at 1..max(nTokens−k+1, 1); a short text
  *    contributes its full remainder.
  *
  * When the tokens in a window are separated by single spaces in the
  * source (the overwhelmingly common case), the joined shingle IS a
  * contiguous byte range of the input and is hashed zero-copy;
  * multi-space/tab/newline separators fall back to one scratch-buffer
  * join. Multiset shape: duplicate shingles are KEPT (the HOF path
  * array_distincts them) — irrelevant to the MinHash consumer, whose
  * per-slot min is duplicate-insensitive; `WordShingleHashSpec`
  * asserts hash-set equality with the string path.
  */
case class WordShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be >= 1, got $k")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "graft_word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleHash.hashShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.WordShingleHash.hashShingles($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHash {

  // Java regex \s (ASCII default): [ \t\n\x0B\f\r]
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  def hashShingles(s: UTF8String, k: Int): UnsafeArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    // trim(): strip 0x20 (only) from both ends
    var lo = 0
    var hi = s.numBytes()
    while (lo < hi && s.getByte(lo) == 0x20) lo += 1
    while (hi > lo && s.getByte(hi - 1) == 0x20) hi -= 1

    // tokenize like split("\\s+", -1): token byte ranges [start, end);
    // a leading/trailing whitespace run yields an empty boundary token
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = lo
    var tokStart = lo
    while (i < hi) {
      if (isWs(s.getByte(i))) {
        starts.add(tokStart); ends.add(i)
        while (i < hi && isWs(s.getByte(i))) i += 1
        tokStart = i
      } else i += 1
    }
    starts.add(tokStart); ends.add(hi) // final token (empty if trailing ws)
    val nTok = starts.size()

    val count = math.max(nTok - k + 1, 1)
    val out = new Array[Long](count)
    var scratch: Array[Byte] = null
    var g = 0
    while (g < count) {
      val last = math.min(g + k, nTok) - 1
      // zero-copy when every separator in the window is a single 0x20
      var contiguous = true
      var j = g
      while (contiguous && j < last) {
        if (ends.get(j) + 1 != starts.get(j + 1) || s.getByte(ends.get(j)) != 0x20)
          contiguous = false
        j += 1
      }
      if (contiguous) {
        val sb = starts.get(g).intValue()
        val eb = ends.get(last).intValue()
        out(g) = XXH64.hashUnsafeBytes(base, offset + sb, eb - sb, 42L)
      } else {
        if (scratch == null) scratch = new Array[Byte](math.max(hi - lo, 1))
        var len = 0
        var t = g
        while (t <= last) {
          if (t > g) { scratch(len) = 0x20; len += 1 }
          val ts = starts.get(t).intValue()
          val te = ends.get(t).intValue()
          var b = ts
          while (b < te) { scratch(len) = s.getByte(b); len += 1; b += 1 }
          t += 1
        }
        out(g) = XXH64.hashUnsafeBytes(scratch,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      }
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object WordShingleHashes {
  /** Column-level constructor. */
  def wordShingleHashes(text: Column, k: Int): Column =
    GraftSqlBridge.column(WordShingleHashes(GraftSqlBridge.expression(text), k))
}
