package graft.tools

/** Dump every oracle SQL text, key-sorted, to a file — the
  * byte-identical-refactor proof harness for [[graft.OracleQueries]]
  * hygiene passes (run before and after a CTE factoring, diff the
  * dumps). No SparkSession needed. */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_sql_dump.txt"
    val sb = new StringBuilder
    graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(s"===== $k =====\n").append(v).append("\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[dump] ${graft.SparkEntry.oracleSql.size} oracles -> $out")
  }
}
