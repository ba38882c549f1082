package graft
import java.nio.file.{Files, Paths}
/** Writes SparkEntry.oracleSql as oracle_sql.json WITHOUT running any query
  * (no SparkSession). Feeds tools/check_oracle_types.py, the permanent
  * oracle type-stability gate: DuckDB promotes SUM(BIGINT) to HUGEINT,
  * pandas renders HUGEINT as float64, and the driver's exact hash then
  * diverges (the round-5 red-set root cause). Run:
  *   sbt "runMain graft.DumpOracle /tmp/oracle"
  *   python3 tools/check_oracle_types.py /tmp/oracle/oracle_sql.json /root/testdata/sf0.001
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_oracle")
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[dump-oracle] ${SparkEntry.oracleSql.size} statements -> $outDir/oracle_sql.json")
  }
}
