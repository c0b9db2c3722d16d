package graft
import java.nio.file.{Files, Paths}

/** Dumps every SparkEntry.oracleSql entry as `<out>/<key>.sql` — no Spark
  * session, so it runs in seconds. The round-workflow byte-stability
  * check: dump before and after touching an oracle GENERATOR, `diff -r`
  * the two directories; defaults must stay byte-identical (CLAUDE.md).
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_dump")
    new java.io.File(out).mkdirs()
    SparkEntry.oracleSql.foreach { case (k, v) =>
      Files.writeString(Paths.get(s"$out/$k.sql"), v)
    }
    println(s"wrote ${SparkEntry.oracleSql.size} oracle SQL files to $out")
  }
}
