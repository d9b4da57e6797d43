package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation: per-domain caps and per-language token-budget quota
  * fill — the "data mixing" stage that sits between dedup and training.
  */
object Curation {

  /** Keep at most k rows per stratum, best score first (ties to smallest
    * id). Uses the bounded top-k aggregate, not a window rank: map-side
    * partial aggregation carries O(k) state per group, so a hot stratum
    * (one boilerplate domain with 10^8 pages) never sorts on a single
    * reducer. One shuffle on the stratum key, then an id semi-join back
    * to the full rows.
    */
  def capPerStratum(df: DataFrame, strata: Seq[String], scoreCol: String,
                    idCol: String, k: Int): DataFrame = {
    val kept = df.groupBy(strata.map(col): _*)
      .agg(graft.functions.TopKByScore.topKIds(
        col(scoreCol), col(idCol), k).as("_kept_ids"))
      .select(explode(col("_kept_ids")).as(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** Greedy quota fill: within each stratum, take rows in (score desc, id
    * asc) order while the budget lasts; a row is kept iff the cost BEFORE
    * it is under the budget (so the last kept row may overflow — the
    * standard greedy-fill convention). The running sum is sequential per
    * stratum by definition; strata are few (languages / mixture buckets),
    * so this window is over a handful of partitions whose size the
    * preceding cap already bounded. For an unbounded stratum at deploy
    * scale, the two-pass variant (approximate score threshold from a
    * quantile sketch, then filter) replaces the window — same semantics
    * up to ties at the threshold.
    */
  def quotaFill(df: DataFrame, stratum: String, costCol: String,
                scoreCol: String, idCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(costCol)).over(w))
      .filter(col("_cum") - col(costCol) < budget)
      .drop("_cum")
  }
}
