package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components vs a brute union-find reference on adversarial
  * graph shapes, plus determinism and the survivor-selection rule.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("cc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Brute union-find: node -> min id of its component. */
  private def bruteLabels(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // roots may still chain; a second find pass flattens to the min
    nodes.map(n => n -> find(n)).toMap
  }

  private def sparkLabels(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = if (pairs.isEmpty) Seq.empty[(Long, Long)].toDF("u", "v")
             else pairs.toDF("u", "v")
    ConnectedComponents.labels(spark, df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(pairs: Seq[(Long, Long)], label: String): Unit = {
    val got = sparkLabels(pairs)
    val want = bruteLabels(pairs.filter(p => p._1 != p._2)) ++
      pairs.filter(p => p._1 == p._2)
        .flatMap(p => Seq(p._1))
        .filterNot(n => pairs.exists(q => q._1 != q._2 && (q._1 == n || q._2 == n)))
        .map(n => n -> n).toMap
    assert(got == want, s"$label: got ${got.toSeq.sorted.take(10)} want ${want.toSeq.sorted.take(10)}")
  }

  test("path graph (worst diameter for label propagation)") {
    check((1L until 64L).map(i => (i, i + 1)), "P64")
  }

  test("reversed-order path (labels must flow against edge orientation)") {
    check((1L until 40L).map(i => (i + 1, i)), "P40 reversed")
  }

  test("star, cycle, and two components") {
    check((2L to 30L).map(i => (1L, i)), "star")
    check((1L until 20L).map(i => (i, i + 1)) :+ ((20L, 1L)), "C20")
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L)), "2 comps")
  }

  test("random graphs match brute union-find") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val n = 60 + trial * 25
      val edges = Seq.fill(n)((rng.nextInt(50).toLong, rng.nextInt(50).toLong))
      check(edges, s"random trial $trial")
    }
  }

  test("self-loops and duplicate/reversed pairs") {
    check(Seq((5L, 5L)), "lone self-loop")
    check(Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L)), "dups + reversal")
  }

  test("empty edge set yields empty labels") {
    assert(sparkLabels(Seq.empty).isEmpty)
  }

  test("non-contiguous 64-bit ids") {
    check(Seq((1L << 40, 3L), (3L, Long.MaxValue - 5), (2L, 1L << 33)), "big ids")
  }

  test("labels deterministic across parallelism") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val edges = Seq.fill(300)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
    val a = ConnectedComponents.labels(spark, edges.toDF("u", "v").repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = ConnectedComponents.labels(spark, edges.toDF("u", "v").repartition(13))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("dedupClusters keeps the longest text, ties to smallest id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa"), (2L, "aaaa"), (3L, "aa"),   // cluster {1,2,3}: survivor 2
      (7L, "xx"), (8L, "xx"),                 // cluster {7,8}: tie -> 7
      (9L, "zzz")                             // unpaired: not in output
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a_id", "b_id")
    val out = ConnectedComponents.dedupClusters(spark, docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 1L, 2L),
      (7L, 7L, 7L), (8L, 7L, 7L)))
  }
}
