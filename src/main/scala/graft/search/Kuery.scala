package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kuery (KQL-subset) query-string compiler: the saved-search / dashboard
  * filter-bar language of the reference's OpenSearch dashboards
  * (deployment/infra/resources/lambda/opensearch-bootstrap/resources/
  * dashboards/data-skew.ndjson line 14 stores a kuery saved search;
  * line 2 a `phrase` filter on `appName.keyword`), compiled directly to
  * a Catalyst `Column` so the whole predicate stays inside whole-stage
  * codegen and pushes to the parquet scan like any hand-written filter.
  *
  * Supported subset (documented, deliberately small):
  *
  *   - `field: value` — term query. On StringType fields this is
  *     CONTAINS (OpenSearch analyzed-text semantics); with a `.keyword`
  *     suffix it is exact equality (keyword semantics, the reference's
  *     phrase-filter form); on numeric/boolean/timestamp fields it is a
  *     typed equality.
  *   - `field >= v`, `>`, `<=`, `<` — typed range comparisons.
  *   - Wildcards `*` in an unquoted value — whole-value LIKE match
  *     (`text: *slow*`, `appName.keyword: TPCDS*`); `%`/`_`/`\` in the
  *     value are escaped so only `*` is magic. A bare `field: *` is
  *     KQL's existence query — isNotNull on any field type.
  *   - `"quoted phrase"` — phrase value (no wildcard interpretation;
  *     `\"` and `\\` escapes).
  *   - `and` / `or` / `not` (case-insensitive), parentheses; standard
  *     precedence not > and > or.
  *   - `field: (a or b)` — value groups.
  *   - Bare terms — free-text search over the caller's default fields;
  *     CONSECUTIVE bare words merge into one phrase, which is exactly
  *     how the reference's saved search `TPCDS SQL Benchmark 3000 GB`
  *     reads.
  *
  * Dotted paths resolve through nested structs (`level.name`); a
  * trailing `.keyword` resolves to the parent field with exact-match
  * semantics. Unknown fields and type-invalid comparisons fail fast
  * with a descriptive IllegalArgumentException at compile time, never
  * at executor time.
  */
object Kuery {

  // ---------------------------------------------------------------- AST

  private sealed trait Node
  private final case class OrN(l: Node, r: Node) extends Node
  private final case class AndN(l: Node, r: Node) extends Node
  private final case class NotN(n: Node) extends Node
  /** op ∈ {":", "<", "<=", ">", ">="}; quoted values never wildcard. */
  private final case class Cmp(field: String, op: String, value: String,
      quoted: Boolean) extends Node
  private final case class Free(phrase: String) extends Node

  // ------------------------------------------------------------- tokens

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AndT extends Tok
  private case object OrT extends Tok
  private case object NotT extends Tok
  private final case class OpT(op: String) extends Tok
  private final case class WordT(s: String) extends Tok
  private final case class QuotedT(s: String) extends Tok

  private def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == ':') { out += OpT(":"); i += 1 }
      else if (c == '<' || c == '>') {
        if (i + 1 < n && q.charAt(i + 1) == '=') { out += OpT(s"$c="); i += 2 }
        else { out += OpT(c.toString); i += 1 }
      } else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = q.charAt(i)
          if (d == '\\' && i + 1 < n &&
              (q.charAt(i + 1) == '"' || q.charAt(i + 1) == '\\')) {
            sb += q.charAt(i + 1); i += 2
          } else if (d == '"') { closed = true; i += 1 }
          else { sb += d; i += 1 }
        }
        if (!closed) fail(q, "unterminated quoted phrase")
        out += QuotedT(sb.toString)
      } else {
        val start = i
        while (i < n && !q.charAt(i).isWhitespace &&
          !"():<>\"".contains(q.charAt(i))) i += 1
        val w = q.substring(start, i)
        w.toLowerCase match {
          case "and" => out += AndT
          case "or"  => out += OrT
          case "not" => out += NotT
          case _     => out += WordT(w)
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- parser

  private final class Parser(q: String, toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = toks.lift(pos)
    private def advance(): Tok = { val t = toks(pos); pos += 1; t }
    private def expect(t: Tok): Unit =
      if (peek.contains(t)) pos += 1 else fail(q, s"expected $t at token $pos")

    def parse(): Node = {
      val n = parseOr()
      if (pos != toks.length) fail(q, s"trailing input at token $pos")
      n
    }

    private def parseOr(): Node = {
      var l = parseAnd()
      while (peek.contains(OrT)) { advance(); l = OrN(l, parseAnd()) }
      l
    }

    private def parseAnd(): Node = {
      var l = parseNot()
      while (peek.contains(AndT)) { advance(); l = AndN(l, parseNot()) }
      l
    }

    private def parseNot(): Node = peek match {
      case Some(NotT) => advance(); NotN(parseNot())
      case _          => parsePrimary()
    }

    private def parsePrimary(): Node = peek match {
      case Some(LP) =>
        advance(); val n = parseOr(); expect(RP); n
      case Some(WordT(w)) if toks.lift(pos + 1).exists(_.isInstanceOf[OpT]) =>
        advance()
        val OpT(op) = advance(): @unchecked
        parseValue(w, op)
      case Some(WordT(_)) | Some(QuotedT(_)) => parseFreeText()
      case other => fail(q, s"unexpected ${other.getOrElse("end of input")}")
    }

    /** Value after `field op` — a word, a phrase, or a parenthesized
      * or/and group of values (`field: (a or b)`).
      */
    private def parseValue(field: String, op: String): Node = peek match {
      case Some(WordT(w))   => advance(); Cmp(field, op, w, quoted = false)
      case Some(QuotedT(s)) => advance(); Cmp(field, op, s, quoted = true)
      case Some(LP) =>
        advance()
        var n = parseValue(field, op)
        var more = true
        while (more) peek match {
          case Some(OrT)  => advance(); n = OrN(n, parseValue(field, op))
          case Some(AndT) => advance(); n = AndN(n, parseValue(field, op))
          case _          => more = false
        }
        expect(RP)
        n
      case other => fail(q, s"expected a value for '$field $op', got " +
        other.getOrElse("end of input"))
    }

    /** Consecutive bare words/phrases (none starting a field query)
      * merge into one free-text phrase.
      */
    private def parseFreeText(): Node = {
      val parts = Seq.newBuilder[String]
      var more = true
      while (more) peek match {
        case Some(WordT(_)) if toks.lift(pos + 1).exists(_.isInstanceOf[OpT]) =>
          more = false // next word starts a field query
        case Some(WordT(w))   => advance(); parts += w
        case Some(QuotedT(s)) => advance(); parts += s
        case _                => more = false
      }
      Free(parts.result().mkString(" "))
    }
  }

  private def fail(q: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"kuery parse error in '$q': $msg")

  // ------------------------------------------------------------ compile

  /** `*`-wildcard value → SQL LIKE pattern (only `*` is magic). */
  private def likePattern(v: String): String =
    v.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      .replace("*", "%")

  private def resolve(schema: StructType, path: String, q: String)
      : Option[(Column, DataType, Boolean)] = {
    def walk(dt: DataType, parts: List[String]): Option[DataType] =
      (dt, parts) match {
        case (_, Nil) => Some(dt)
        case (st: StructType, p :: rest) =>
          st.fields.find(_.name == p).flatMap(f => walk(f.dataType, rest))
        case _ => None
      }
    val parts = path.split('.').toList
    val exact = parts.lastOption.contains("keyword") && parts.length > 1
    val real = if (exact) parts.dropRight(1) else parts
    walk(schema, real).map(dt => (col(real.mkString(".")), dt, exact))
  }

  private def typedLit(dt: DataType, v: String, field: String, q: String)
      : Column = {
    def bad(kind: String): Nothing = fail(q,
      s"'$v' is not a valid $kind for field '$field'")
    dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        lit(try v.toLong catch { case _: NumberFormatException => bad("integer") })
      case _: FloatType | _: DoubleType | _: DecimalType =>
        lit(try v.toDouble catch { case _: NumberFormatException => bad("number") })
      case _: BooleanType =>
        v.toLowerCase match {
          case "true" => lit(true); case "false" => lit(false)
          case _ => bad("boolean")
        }
      case _: TimestampType | _: TimestampNTZType | _: DateType =>
        lit(v).cast(dt)
      case other => fail(q, s"cannot compare field '$field' of type $other")
    }
  }

  private def compileCmp(schema: StructType, c: Cmp, q: String): Column = {
    val (column, dt, exactKeyword) = resolve(schema, c.field, q)
      .getOrElse(fail(q, s"unknown field '${c.field}'"))
    // KQL existence query: `field: *` matches any row where the field
    // is present — isNotNull on any type
    if (c.op == ":" && !c.quoted && c.value == "*") return column.isNotNull
    val wildcard = !c.quoted && c.value.contains("*")
    (c.op, dt) match {
      case (":", _: StringType) =>
        if (wildcard) column.like(likePattern(c.value))
        else if (exactKeyword) column === c.value
        else column.contains(c.value)
      case (":", _) =>
        if (wildcard) fail(q, s"wildcard on non-string field '${c.field}'")
        else column === typedLit(dt, c.value, c.field, q)
      case (op, _) =>
        if (wildcard) fail(q, s"wildcard with range operator on '${c.field}'")
        val l = dt match {
          case _: StringType => lit(c.value)
          case _ => typedLit(dt, c.value, c.field, q)
        }
        op match {
          case "<"  => column < l
          case "<=" => column <= l
          case ">"  => column > l
          case ">=" => column >= l
          case _    => fail(q, s"unsupported operator $op")
        }
    }
  }

  private def compile(schema: StructType, node: Node, default: Seq[String],
      q: String): Column = node match {
    case OrN(l, r)  => compile(schema, l, default, q) || compile(schema, r, default, q)
    case AndN(l, r) => compile(schema, l, default, q) && compile(schema, r, default, q)
    case NotN(n)    => !compile(schema, n, default, q)
    case c: Cmp     => compileCmp(schema, c, q)
    case Free(phrase) =>
      if (default.isEmpty) fail(q, "free-text term but no default fields configured")
      default.map { f =>
        val (column, dt, _) = resolve(schema, f, q)
          .getOrElse(fail(q, s"unknown default field '$f'"))
        dt match {
          case _: StringType => column.contains(phrase)
          case _ => fail(q, s"default field '$f' is not a string")
        }
      }.reduce(_ || _)
  }

  // ------------------------------------------------------------- public

  /** Compile a kuery string to a filter `Column` against `schema`.
    * `defaultFields` are the string columns free-text terms search.
    */
  def predicate(schema: StructType, kuery: String,
      defaultFields: Seq[String]): Column = {
    val toks = tokenize(kuery)
    if (toks.isEmpty) lit(true)
    else compile(schema, new Parser(kuery, toks).parse(), defaultFields, kuery)
  }

  def predicate(df: DataFrame, kuery: String,
      defaultFields: Seq[String] = Seq.empty): Column =
    predicate(df.schema, kuery, defaultFields)
}
