package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{CellId, CellUnion}
import java.nio.file.{Files, Paths}

/** Resumable chunked execution with per-chunk lineage + row-count metrics.
  *
  * The input keyspace is the Hilbert leaf-cell line. We tile it into
  * contiguous cell ranges (CellUnionFromRange semantics,
  * /root/reference/s2/cellunion.go:37-49), process one range at a time,
  * and persist each chunk's output plus a manifest line recording the
  * range, input/output row counts, and wall time. A restarted run reads
  * the manifest and skips completed chunks — the per-partition checkpoint
  * / resume contract from the north rule. Alongside an Iceberg table the
  * manifest would ride in the snapshot summary; on plain parquet it is a
  * JSONL file next to the output.
  *
  * Chunk boundaries come from equal-width Hilbert position slices, so they
  * are deterministic, independent of parallelism, and each chunk's filter
  * (`cell BETWEEN lo AND hi`) pushes down to the scan.
  */
object CheckpointedPipeline {

  final case class ChunkResult(chunkId: Int, cellLo: String, cellHi: String,
                               rowsIn: Long, rowsOut: Long, wallMs: Long,
                               skipped: Boolean)

  /** Deterministic chunk boundaries: nChunks equal slices of the signed-
    * shifted Hilbert line (cell ids made order-compatible with signed Long
    * by flipping the sign bit).
    */
  def chunkBounds(nChunks: Int): Seq[(Long, Long)] = {
    // valid leaf ids span [face0 first leaf, face5 last leaf]
    val lo = CellId.rangeMin(CellId.fromFace(0))
    val hi = CellId.rangeMax(CellId.fromFace(5))
    val loS = lo ^ Long.MinValue
    val hiS = hi ^ Long.MinValue
    val width = (hiS - loS) / nChunks
    (0 until nChunks).map { i =>
      val a = loS + width * i
      val b = if (i == nChunks - 1) hiS else loS + width * (i + 1) - 1
      (a ^ Long.MinValue, b ^ Long.MinValue)
    }
  }

  /** Run `transform` over the input in resumable Hilbert-range chunks.
    *
    * @param input     must contain `cellCol` (leaf cell id)
    * @param transform chunk DataFrame => output DataFrame
    * @param outDir    chunk outputs + manifest.jsonl live here
    * @return metrics for every chunk of this invocation
    * @param cellColUnsigned when true, `cellCol` already stores the
    *   sign-flipped (unsigned-order) cell value — e.g. the `cell_sort`
    *   column a CellClusteredWrite layout persists — and each chunk
    *   filter is a plain BETWEEN on that attribute, which pushes down to
    *   parquet min/max stats and physically skips non-matching row
    *   groups. With false (raw cell ids) the sign-flip happens in the
    *   filter expression, which Spark cannot push past the scan.
    */
  def run(spark: SparkSession, input: DataFrame, cellCol: String,
          transform: DataFrame => DataFrame, outDir: String,
          nChunks: Int = 8, failAfterChunks: Int = Int.MaxValue,
          cellColUnsigned: Boolean = false): Seq[ChunkResult] = {
    Files.createDirectories(Paths.get(outDir))
    val manifestPath = Paths.get(s"$outDir/manifest.jsonl")
    val done: Set[Int] =
      if (Files.exists(manifestPath))
        scala.jdk.CollectionConverters.ListHasAsScala(
          Files.readAllLines(manifestPath)).asScala
          .flatMap(l => "\"chunkId\":(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toInt))
          .toSet
      else Set.empty

    val results = scala.collection.mutable.ArrayBuffer[ChunkResult]()
    var processed = 0
    for (((lo, hi), idx) <- chunkBounds(nChunks).zipWithIndex) {
      val loTok = CellId.toToken(lo)
      val hiTok = CellId.toToken(hi)
      if (done.contains(idx)) {
        results += ChunkResult(idx, loTok, hiTok, -1, -1, 0, skipped = true)
      } else if (processed < failAfterChunks) {
        val t0 = System.nanoTime()
        val loS = lo ^ Long.MinValue
        val hiS = hi ^ Long.MinValue
        val chunk =
          if (cellColUnsigned)
            // plain attribute BETWEEN: pushes to parquet min/max stats
            input.filter(col(cellCol) >= loS && col(cellCol) <= hiS)
          else
            // raw cell ids: unsigned BETWEEN via a sign-bit-flip expression
            // (correct everywhere, but opaque to parquet stats pruning)
            input.filter(
              (col(cellCol).bitwiseXOR(lit(Long.MinValue)) >= loS) &&
                (col(cellCol).bitwiseXOR(lit(Long.MinValue)) <= hiS))
        val rowsIn = chunk.count()
        val out = transform(chunk)
        val path = s"$outDir/chunk_$idx"
        out.write.mode("overwrite").parquet(path)
        val rowsOut = spark.read.parquet(path).count()
        val wallMs = (System.nanoTime() - t0) / 1000000
        val rec = ChunkResult(idx, loTok, hiTok, rowsIn, rowsOut, wallMs, skipped = false)
        Files.writeString(manifestPath,
          s"""{"chunkId":$idx,"cellLo":"$loTok","cellHi":"$hiTok","rowsIn":$rowsIn,"rowsOut":$rowsOut,"wallMs":$wallMs}\n""",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
        results += rec
        processed += 1
      }
    }
    results.toSeq
  }

  /** Total input records emitted by scans while `job` runs — the physical
    * measurement behind the data-skipping claim. The vectorized parquet
    * reader applies row-group stats pruning BELOW this metric and Spark's
    * residual Filter ABOVE it, so a chunk filter that prunes reports only
    * the surviving row groups' rows while one that does not reports the
    * whole table per scan. (bytesRead is useless here: on the local
    * filesystem it returns a constant per task regardless of what the
    * reader actually touched.) Task metrics arrive on the listener bus
    * asynchronously, so the queue is drained before the sum is read.
    */
  def scanRecordsDuring(spark: SparkSession)(job: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) acc.addAndGet(m.inputMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      job
      org.apache.spark.GraftSparkBridge.waitListenerQueueEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    acc.get()
  }

  /** Read back all completed chunk outputs as one DataFrame. */
  def readOutput(spark: SparkSession, outDir: String): DataFrame = {
    val dirs = new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("chunk_"))
      .map(_.getPath)
    require(dirs.nonEmpty, s"no chunk outputs under $outDir")
    spark.read.parquet(dirs.toIndexedSeq: _*)
  }
}
