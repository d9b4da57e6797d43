package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair graph, and
  * near-dup cluster collapse built on top of it.
  *
  * The near-dup operators (minHashLsh / simHashPairs / ngramJaccardPairs /
  * embedding LSH) emit PAIRS; an actual training-data dedup has to turn
  * those pairs into clusters and keep one survivor per cluster. The
  * transitive step is a connected-components problem, solved here with
  * the alternating large-star / small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14): each round
  * is two bounded shuffle stages over the edge set, and the edge set
  * converges to per-component stars centered at the component minimum in
  * O(log n) rounds regardless of graph diameter — the property that makes
  * it the right shape at 10^12 rows, where a label-propagation loop would
  * need diameter-many rounds (a dup CHAIN a->b->c->... is common in
  * near-dup graphs: each hop is within threshold while the ends are not).
  *
  * Scale notes:
  *  - Every stage is a groupBy-min or an equi-join on a Long node id —
  *    map-side partial aggregation applies, and AQE's skew split covers
  *    hot star centers (a boilerplate cluster with millions of members
  *    appears as one hot key exactly once per round, in the join against
  *    its own min).
  *  - The loop localCheckpoints each round's edge set: iterative
  *    DataFrame self-reference otherwise stacks one analysis-plan layer
  *    per round (quadratic planning). On a cluster, a reliable
  *    checkpoint dir gives the same cut plus executor-loss recovery.
  *  - Determinism: min over Longs — the labels are a pure function of
  *    the edge set at any parallelism.
  */
object ConnectedComponents {

  /** Component label per node: (id, cluster_id) where cluster_id is the
    * minimum node id in the component. Input is any DataFrame whose first
    * two columns are Long endpoint ids (self-loops and duplicate /
    * reversed pairs are fine). Nodes only ever seen in self-loops get
    * their own label.
    *
    * @param maxRounds safety bound; the alternating-star fixpoint is
    *                  reached in O(log n) rounds (~2*ceil(log2 n) worst
    *                  case), so the default never binds on real inputs —
    *                  hitting it is a bug, so it throws rather than
    *                  returning possibly-unconverged labels.
    */
  def labels(spark: SparkSession, pairs: DataFrame, maxRounds: Int = 40): DataFrame = {
    val cols = pairs.columns
    // Materialize the input once: everything below (self-loop split, the
    // round loop, the final label union) re-reads it, and the upstream
    // plan is typically a whole LSH pipeline we must not re-run per use.
    val raw = pairs.select(
      col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
      .localCheckpoint()

    // Nodes whose every edge is a self-loop still need a label row.
    val selfOnly = raw.filter(col("u") === col("v"))
      .select(col("u").as("id")).distinct()

    var edges = raw.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("hi"),
        least(col("u"), col("v")).as("lo"))
      .distinct()
      .localCheckpoint()

    var converged = edges.isEmpty
    var round = 0
    while (!converged && round < maxRounds) {
      // Large-star: every node u connects its LARGER neighbors to
      // min(N(u) ∪ {u}). Both edge directions contribute, so build the
      // symmetric view once per round.
      val sym = edges.select(col("hi").as("a"), col("lo").as("b"))
        .unionByName(edges.select(col("lo").as("a"), col("hi").as("b")))
      val mins = sym.groupBy("a").agg(least(min(col("b")), col("a")).as("m"))
      // No distinct here: duplicate (hi, lo) rows are harmless to the
      // min-aggregation below and collapse in the small-star's terminal
      // distinct — skipping it saves one full shuffle per round.
      val afterLarge = sym.join(mins, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))

      // Small-star: every node u connects its SMALLER neighbors (and
      // itself) to the minimum among them. afterLarge is already in
      // (hi, lo) orientation, so the "neighbors smaller than u" view is
      // just the edge list grouped by hi.
      val minsSmall = afterLarge.groupBy("hi").agg(min(col("lo")).as("m"))
      val afterSmall = afterLarge.join(minsSmall, "hi")
        .select(col("lo").as("x"), col("m"))
        .filter(col("x") =!= col("m"))
        .select(greatest(col("x"), col("m")).as("hi"),
          least(col("x"), col("m")).as("lo"))
        .unionByName(minsSmall.select(col("hi"), col("m").as("lo")))
        .filter(col("hi") =!= col("lo"))
        .distinct()
        .localCheckpoint()

      // Fixpoint test, one action: the (distinct, hi>lo-oriented) edge
      // set is a depth-1 forest iff every hi appears exactly once AND no
      // lo is also a hi. Orientation makes this sufficient: each star
      // center sits below all its members, and connectivity puts the
      // whole component in the star, so the center IS the component min
      // — exactly the algorithm's fixpoint. (Cheaper than the two
      // exceptAll set-equality scans, and sound rather than heuristic.)
      val dupHi = afterSmall.groupBy("hi").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(lit(1).as("one"))
      val loAsHi = afterSmall.select(col("lo"))
        .join(afterSmall.select(col("hi").as("lo")), Seq("lo"), "left_semi")
        .select(lit(1).as("one"))
      converged = dupHi.unionByName(loAsHi).isEmpty
      edges = afterSmall
      round += 1
    }
    require(converged,
      s"connected components did not converge in $maxRounds rounds")

    // Fixpoint edges are stars (member -> component min): members label
    // from their edge, centers label themselves, self-loop-only nodes too.
    val memberLabels = edges.select(col("hi").as("id"), col("lo").as("cluster_id"))
    val centerLabels = edges.select(col("lo").as("id"), col("lo").as("cluster_id"))
      .distinct()
    memberLabels.unionByName(centerLabels)
      .unionByName(selfOnly.join(memberLabels.unionByName(centerLabels)
        .select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("cluster_id")))
  }

  /** Near-dup cluster collapse: label every doc that participates in at
    * least one pair, and pick one survivor per cluster — the longest text,
    * ties to the smallest doc_id (the keep-the-fullest-version rule a
    * crawl dedup wants; any deterministic rule works).
    *
    * @return (doc_id, cluster_id, survivor_id), one row per clustered doc
    */
  def dedupClusters(spark: SparkSession, docs: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val labeled = labels(spark, pairs)
    val len = docs.select(col(idCol).cast("long").as("id"),
      length(col(textCol)).cast("long").as("text_len"))
    // min_by over a (−len, id) struct instead of a per-cluster window:
    // the aggregate combines map-side, so a boilerplate cluster with
    // millions of members never sorts on one reducer.
    val survivors = labeled.join(len, "id")
      .groupBy("cluster_id")
      .agg(min_by(col("id"),
        struct((-col("text_len")).as("neg_len"), col("id").as("tid")))
        .as("survivor_id"))
    labeled.join(survivors, "cluster_id")
      .select(col("id").as("doc_id"), col("cluster_id"), col("survivor_id"))
  }
}
