package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{ShuffleSpatialJoin, SpatialJoin}

/** Throwaway stage profiler for q_pip_10k (not part of the gate). */
object Pip10kProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm JVM + parquet fixture
    val pagesPath = graft.sources.PagesSource.pagesParquet(spark, sfDir)
    val pages = graft.sources.PagesSource.withLatLng(
      spark.read.parquet(pagesPath))
    pages.count()
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val polys = t("tenKPolys")(graft.SparkEntry.tenKPolys)
      val coverings = t("coverings")(
        SpatialJoin.polygonCoveringsDistributed(spark, polys, maxCells = 8))
      val level = ShuffleSpatialJoin.chooseLevel(coverings.map(_._2), 500000L)
      println(s"[profile] level=$level")
      val dim = ShuffleSpatialJoin.polygonDimTable(
        spark, polys, level, precomputed = Some(coverings))
      t("dim build+count")(println("dimRows=" + dim.count()))
      import graft.functions.S2
      val pts = pages.withColumn("cell_lk",
        S2.parent(S2.cellId(col("lat"), col("lng")), lit(level)))
      t("pts parse+cell+count")(println("pts=" + pts.count()))
      val candidates = pts.join(dim.hint("merge"), "cell_lk")
      t("candidates count")(println("cand=" + candidates.count()))
      t("candidates interior/boundary")(println("split=" +
        candidates.groupBy("is_interior").count().collect().mkString(",")))
      val joined = ShuffleSpatialJoin.pipJoinLarge(
        spark, pages, polys, maxDimRows = 500000L,
        precomputed = Some(coverings))
        .select(col("url"), col("poly_id"))
      t("join+count")(println("rows=" + joined.count()))
      t("join+write")(joined.write.mode("overwrite")
        .parquet("/tmp/pip10k_profile_out"))
      t("readback+filter+count")(println("sampled=" + spark.read
        .parquet("/tmp/pip10k_profile_out")
        .filter(pmod(col("poly_id"), lit(250)) === 0).count()))
    }
    spark.stop()
  }
}
