package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump selected declared queries (result parquet + oracle_sql
  * .json) so tools/check_oracle.py can gate them without a full Verify
  * sweep. `runMain graft.tools.DumpOne <sfDir> <outDir> <key>...`
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val (dir, out, keys) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    keys.foreach { k =>
      graft.SparkEntry.queries(k)(spark, dir)
        .repartition(1).write.mode("overwrite").parquet(s"$out/$k")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => keys.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
