package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: kNN for a query point in an empty ocean region (radius-expansion
  * stress + fallback path).
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = graft.sources.PagesSource.withLatLng(
      spark.read.parquet(graft.sources.PagesSource.pagesParquet(spark, "/root/testdata/sf0.001")))
    // Point Nemo — the oceanic pole of inaccessibility; nothing within 100km.
    val out = graft.ops.SpatialJoin.knnJoin(spark, pts,
      Seq((99L, -48.8767, -123.3933)), k = 3, tieBreakCol = "url")
    out.select("query_id", "url", "dist_rad", "knn_rank").show(5, false)
    println("rows=" + out.count())
    spark.stop()
  }
}
