package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Hilbert-clustered table writes — the local-parquet analogue of
  * Iceberg's `write.order-by cell_id` clustering (SURVEY.md §4
  * "Hilbert-order locality"; reference iteration order
  * shapeindex.go:202-212).
  *
  * Rows are range-partitioned and sorted by the UNSIGNED cell-id order
  * (sign-bit flip: cell ids are uint64 in the reference, and faces 4-5
  * set the sign bit of the JVM long), so every output file covers a
  * contiguous leaf-cell range. Parquet min/max column stats then give
  * file- and row-group-level skipping for any cell-range predicate —
  * the same data-skipping contract an Iceberg table would provide at
  * 100 TB, demonstrated here with plain parquet.
  */
object CellClusteredWrite {

  /** The unsigned-order sort key for a cell id column. */
  def sortKey(cellCol: String) =
    (col(cellCol).bitwiseXOR(lit(Long.MinValue))).as("cell_sort")

  /** Write df clustered by cell: range partition + in-partition sort on
    * the unsigned cell order, one contiguous Hilbert range per file.
    */
  def writeClustered(df: DataFrame, cellCol: String, path: String,
                     numFiles: Int): Unit = {
    df.withColumn("cell_sort", sortKey(cellCol))
      .repartitionByRange(numFiles, col("cell_sort"))
      .sortWithinPartitions("cell_sort")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Range-scan predicate for [cellLo, cellHi] in unsigned order against
    * a clustered table (pushes to parquet stats for file skipping).
    */
  def cellRangePredicate(cellLo: Long, cellHi: Long) =
    col("cell_sort").between(cellLo ^ Long.MinValue, cellHi ^ Long.MinValue)
}
