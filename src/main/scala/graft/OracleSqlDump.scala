package graft
import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as JSON WITHOUT building a SparkSession —
  * the cheap input for tools/oracle_times.py, which times each oracle in
  * DuckDB to give the bench an external denominator (BASELINE.json
  * publishes no reference wall-times, so round-over-round was the only
  * comparison; the DuckDB ratio anchors every scale). Shares Verify's
  * escaping contract: the two files must stay byte-compatible for the
  * driver's json.load. */
object OracleSqlDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
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
    Files.writeString(Paths.get(out), json)
    System.err.println(s"[oracle-dump] ${SparkEntry.oracleSql.size} oracle queries -> $out")
  }
}
