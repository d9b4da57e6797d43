package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-peel profile of the headline pipeline (scan -> parse -> encode ->
  * broadcast PIP -> count): times each prefix of the pipeline best-of-5
  * so the marginal cost of every stage is visible. Not part of the gate.
  */
object HeadlineProfile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = graft.Bench.ensurePagesFixture(spark, rows)
    import graft.functions.S2

    def best5(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.collect() // warm
      val walls = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[headline] $label%-28s best ${walls.min}%.3f s  (${rows / walls.min / 1e6}%.1f M rows/s)")
    }

    val raw = spark.read.parquet(path)
    best5("scan(count text)")(raw.select(count(col("text"))))
    val parsed = graft.sources.PagesSource.withLatLng(raw)
    if (sys.env.contains("HEADLINE_EXPLAIN")) {
      parsed.select(count(col("lat"))).explain("formatted")
      parsed.select(count(S2.cellId(col("lat"), col("lng")))).explain("formatted")
    }
    best5("scan+parse")(parsed.select(count(col("lat"))))
    best5("scan+parse+cellid")(parsed.select(
      count(S2.cellId(col("lat"), col("lng")))))
    best5("full (scan+parse+pip+cell)")(
      graft.ops.SpatialJoin.pipJoin(spark, parsed, graft.SparkEntry.cityPolygons)
        .select(count(S2.cellId(col("lat"), col("lng")))))
    spark.stop()
  }
}
