package graft.tools

import org.apache.spark.sql.SparkSession

/** Iteration helper: run ONE SparkEntry query + dump its oracle SQL in the
  * same layout Verify uses, so tools/compare_oracle.py can gate a single
  * query without the full 36-query sweep.
  *
  * usage: runMain graft.tools.RunQuery <name> [sfDir] [outDir]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/runquery_out"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    if (sys.env.contains("RUNQUERY_WARM")) { // bench-style warm pass first
      val tw = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[runquery] $name warm pass ${(System.nanoTime() - tw) / 1e9}%.2f s")
    }
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(f"[runquery] $name wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.get(name)
      .map(sql => s"{${q(name)}: ${q(sql)}}").getOrElse("{}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
