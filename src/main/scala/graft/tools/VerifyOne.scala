package graft.tools

import java.nio.file.{Files, Paths}

/** Single-query slice of [[graft.Verify]] for fast oracle iteration:
  * `tools/run.sh graft.tools.VerifyOne <query> [sfDir] [outDir]`, then
  * `python3 tools/selfcheck.py <sfDir> <outDir>` compares just that
  * query (the dumped oracle_sql.json carries only the one entry). */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(2).getOrElse(s"/tmp/verify_one")
    val spark = graft.engine.Engine.session(
      "graft-verify-one", Some("local[8]"), shufflePartitions = 8)
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sql = graft.SparkEntry.oracleSql(name)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"{${q(name)}: ${q(sql)}}")
    spark.stop()
  }
}
