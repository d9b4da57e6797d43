package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface for the spatial engine: continuous cell
  * aggregation of a geotagged event stream with event-time watermarks.
  *
  * The reference library is batch-only (SURVEY.md §2.9); this is the
  * engine-side streaming extension: the same codegen'd s2 expressions run
  * unchanged inside a streaming plan, so a pages/events firehose can be
  * bucketed into cells incrementally (e.g. for freshness-weighted tile
  * serving at crawl time).
  */
object StreamingCells {

  /** Windowed page counts per coarse cell over an event stream with
    * columns (ts timestamp, lat double, lng double).
    *
    * Watermark bounds state; output is append-mode compatible.
    */
  def cellCountsStream(events: DataFrame, level: Int,
                       windowDuration: String = "10 minutes",
                       watermarkDelay: String = "5 minutes"): DataFrame = {
    import graft.functions.S2
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("cell", S2.parent(S2.cellId(col("lat"), col("lng")), lit(level)))
      .groupBy(window(col("ts"), windowDuration), col("cell"))
      .agg(count("*").as("n_events"))
      .select(col("window.start").as("window_start"),
        S2.token(col("cell")).as("cell_token"), col("n_events"))
  }

  /** Streaming near-dup screen: incremental exact-hash dedup of a text
    * stream keyed by fingerprint. dropDuplicatesWithinWatermark lets the
    * watermark evict dedup state (a bare dropDuplicates("fp") would keep
    * every fingerprint forever on a long-running stream).
    */
  def streamingDedup(docs: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("fp", graft.ops.TextOps.fingerprint("text"))
      .dropDuplicatesWithinWatermark("fp")
}
