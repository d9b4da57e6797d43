package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-snapshot diff: classify every url across two crawl snapshots as
  * added / deleted / changed, emitting only the delta rows — the
  * incremental-processing feed that lets the 100 TB pipeline recompute
  * |delta| documents instead of the corpus (the Iceberg-changelog shape:
  * downstream dedup/quality/shard stages consume this as their input).
  *
  * One full-outer sort-merge join on the url key; both sides carry only
  * (url, content hash), so the shuffled payload is ~100 bytes/row
  * regardless of document size — text itself never shuffles. Unchanged
  * rows (the overwhelming majority between adjacent crawls) are filtered
  * before anything else sees them. On url-bucketed/url-clustered
  * snapshot layouts the exchange disappears entirely (storage-
  * partitioned join); hot-host url ranges are AQE-splittable otherwise.
  */
object CrawlDelta {

  /** Diff `prev` vs `next` on `keyCol`: rows only for urls that were
    * added (in next only), deleted (in prev only), or whose `textCol`
    * bytes changed; emits (url, status, new_sha — NULL for deletions).
    */
  def crawlDelta(prev: DataFrame, next: DataFrame, keyCol: String,
                 textCol: String): DataFrame = {
    val a = prev.select(col(keyCol).as("url"),
      sha2(col(textCol), 256).as("_sha_a"))
    val b = next.select(col(keyCol).as("url"),
      sha2(col(textCol), 256).as("_sha_b"))
    a.join(b, Seq("url"), "full_outer")
      .withColumn("status",
        when(col("_sha_a").isNull, lit("added"))
          .when(col("_sha_b").isNull, lit("deleted"))
          .when(col("_sha_a") =!= col("_sha_b"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("url"), col("status"), col("_sha_b").as("new_sha"))
  }
}
