package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** A closed per-cell activity session emitted when no event arrives in
    * a cell for the gap duration.
    */
  final case class CellSession(cell_token: String, n_events: Long,
                               first_ts: Long, last_ts: Long)

  /** Custom streaming state via flatMapGroupsWithState: sessionize an
    * event stream by coarse cell. State per cell = (count, first, last);
    * an event extends the session and re-arms an event-time timeout at
    * last + gap; when the watermark passes it, the closed session is
    * emitted and state dropped — bounded state on an infinite stream,
    * the KeyValueGroupedDataset pattern the engine uses wherever
    * windowed aggregation can't express the semantics.
    */
  def cellSessions(events: DataFrame, level: Int,
                   gapMillis: Long = 10 * 60 * 1000L,
                   watermarkDelay: String = "5 minutes"): Dataset[CellSession] = {
    import graft.functions.S2
    val spark = events.sparkSession
    import spark.implicits._
    // Keep the watermarked event-time column intact through the
    // grouping (casting it would drop the watermark attribute).
    val keyed = events
      .withWatermark("ts", watermarkDelay)
      .withColumn("cell", S2.parent(S2.cellId(col("lat"), col("lng")), lit(level)))
      .select(col("cell"), col("ts")).as[(Long, java.sql.Timestamp)]

    def update(cell: Long, rows: Iterator[(Long, java.sql.Timestamp)],
               state: GroupState[(Long, Long, Long)]): Iterator[CellSession] = {
      if (state.hasTimedOut) {
        val (n, first, last) = state.get
        state.remove()
        Iterator.single(CellSession(graft.core.CellId.toToken(cell), n,
          first / 1000, last / 1000))
      } else {
        var (n, first, last) =
          state.getOption.getOrElse((0L, Long.MaxValue, Long.MinValue))
        rows.foreach { case (_, ts) =>
          n += 1
          first = math.min(first, ts.getTime)
          last = math.max(last, ts.getTime)
        }
        state.update((n, first, last))
        // An allowed-late event can put last+gap behind the current
        // watermark when gap < watermark delay; setTimeoutTimestamp
        // rejects timestamps <= watermark, so clamp just past it (the
        // session then closes on the next watermark advance).
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max(last + gapMillis, wm + 1))
        Iterator.empty
      }
    }

    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stream-static spatial enrichment: tag each streaming event with the
    * polygons containing it. The broadcast covering index + native probe
    * expression run unchanged inside the streaming plan (map-only, no
    * stream state), so this costs the same as the batch PIP join per
    * micro-batch.
    */
  def streamingPipEnrich(spark: SparkSession, events: DataFrame,
                         polygons: Seq[(Long, graft.core.Loop)]): DataFrame =
    graft.ops.SpatialJoin.pipJoin(spark, events, polygons)

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

  /** An emitted streaming near-duplicate pair (a_id < b_id). */
  final case class NearDupHit(a_id: Long, b_id: Long, jaccard: Double,
                              ts: java.sql.Timestamp)

  /** Streaming NEAR-duplicate screen: the batch MinHash-LSH pipeline as
    * bounded streaming state. Incoming docs (ts, doc_id, text) are
    * banded into their LSH buckets with the same native expressions as
    * the batch path; per-bucket state keeps the most recent maxBucket
    * (doc_id, sorted shingle set) members; a new doc is exact-verified
    * against its bucket's members and any pair at Jaccard >= threshold
    * is emitted. Idle buckets are evicted by an event-time timeout, so
    * state is bounded by (active buckets x maxBucket) on an infinite
    * stream.
    *
    * Delivery is AT-LEAST-ONCE per pair: a pair agreeing on several
    * bands is emitted once per matching band (Spark disallows a second
    * stateful dedup stage behind flatMapGroupsWithState, the standard
    * global-watermark correctness restriction). Pair identity
    * (a_id, b_id) makes the sink-side distinct idempotent, which is the
    * production pattern for streaming dedup emissions.
    */
  def streamingNearDups(docs: DataFrame, shingleSize: Int = 3,
                        numHashes: Int = 64, bands: Int = 16,
                        threshold: Double = 0.6, maxBucket: Int = 64,
                        seed: Long = 42,
                        watermarkDelay: String = "5 minutes",
                        retentionMillis: Long = 30 * 60 * 1000L): Dataset[NearDupHit] = {
    import graft.functions.TextHash
    val spark = docs.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0)
    val banded = docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("sig",
        TextHash.minHashSig(col("text"), shingleSize, numHashes, seed))
      .withColumn("sh", TextHash.shingleHashes(col("text"), shingleSize))
      .withColumn("band", explode(array((0 until bands).map(lit): _*)))
      .withColumn("bucket",
        TextHash.bandKey(col("sig"), col("band"), numHashes / bands))
      .select(col("bucket"), col("doc_id"), col("sh"), col("ts"))
      .as[(Long, Long, Array[Long], java.sql.Timestamp)]

    def update(bucket: Long,
               rows: Iterator[(Long, Long, Array[Long], java.sql.Timestamp)],
               state: GroupState[List[(Long, Array[Long])]]): Iterator[NearDupHit] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var members = state.getOption.getOrElse(Nil)
        val out = scala.collection.mutable.ArrayBuffer[NearDupHit]()
        var maxTs = Long.MinValue
        // deterministic order within the micro-batch
        for ((_, id, sh, ts) <- rows.toSeq.sortBy(r => (r._4.getTime, r._2))) {
          maxTs = math.max(maxTs, ts.getTime)
          members.foreach { case (mid, msh) =>
            if (mid != id) {
              val j = graft.ops.Dedup.jaccardSorted(msh, sh)
              if (j >= threshold)
                out += NearDupHit(math.min(mid, id), math.max(mid, id), j, ts)
            }
          }
          members = ((id, sh) :: members.filterNot(_._1 == id)).take(maxBucket)
        }
        state.update(members)
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max(maxTs + retentionMillis, wm + 1))
        out.iterator
      }
    }

    banded.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
