package graft

/** Dumps SparkEntry.oracleSql as JSON WITHOUT running any query — the
  * generator-refactor safety net CLAUDE.md mandates: after touching an
  * oracle generator, diff this dump against the prior round's
  * `oracle_sql.json` (the driver's Verify artifact) and confirm that
  * every twin you did NOT mean to change is byte-identical.
  *
  *   sbt "runMain graft.OracleDump /tmp/new_oracle.json"
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("oracle_sql.json")
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val body = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote ${SparkEntry.oracleSql.size} oracle twins to $out")
  }
}
