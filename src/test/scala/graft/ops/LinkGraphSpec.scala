package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point integer PageRank: hand-computed update values, truncating
  * division, parallel-link weights, dangling hosts, iters=0, and
  * bit-identical results across parallelism (the integer-arithmetic
  * determinism contract).
  */
class LinkGraphSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("linkgraph-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val S = 1000000000L

  private def edges(e: (String, String)*) = {
    import spark.implicits._
    e.toDF("src", "dst")
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("one iteration matches the hand-computed integer update") {
    // A->B, A->C, B->C, C->A; out_w A=2, B=1, C=1; r0 = S everywhere.
    // inc: A=S, B=S div 2, C=S div 2 + S.
    // rank1 = (15*S + 85*inc) div 100.
    val r = ranksOf(LinkGraph.hostRank(
      edges("A" -> "B", "A" -> "C", "B" -> "C", "C" -> "A"), iters = 1))
    assert(r("A") == 1000000000L)
    assert(r("B") == 575000000L)
    assert(r("C") == 1425000000L)
  }

  test("integer division truncates exactly like the spec") {
    // A fans to B,C,D: contrib = S div 3 = 333333333 (truncated), then
    // (15*S + 85*333333333) div 100 = 43333333305 div 100 = 433333333.
    val r = ranksOf(LinkGraph.hostRank(
      edges("A" -> "B", "A" -> "C", "A" -> "D"), iters = 1))
    assert(r("B") == 433333333L)
    assert(r("C") == 433333333L && r("D") == 433333333L)
  }

  test("parallel links weight the contribution") {
    // A->B twice, A->C once: out_w(A)=3; contrib(B) = (S*2) div 3.
    val r = ranksOf(LinkGraph.hostRank(
      edges("A" -> "B", "A" -> "B", "A" -> "C"), iters = 1))
    val contribB = (S * 2) / 3
    val contribC = S / 3
    assert(r("B") == (15L * S + 85L * contribB) / 100)
    assert(r("C") == (15L * S + 85L * contribC) / 100)
  }

  test("dangling hosts contribute nothing and report out_w 0") {
    val out = LinkGraph.hostRank(edges("A" -> "B"), iters = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // iter1: rank(A) = 15*S div 100, rank(B) = S.
    // iter2: B (dangling) sends nothing; rank2(B) keys off rank1(A).
    assert(out("A") == ((1L, 150000000L)))
    assert(out("B") == ((0L, (15L * S + 85L * 150000000L) / 100)))
  }

  test("iters=0 returns the uniform base rank") {
    val r = ranksOf(LinkGraph.hostRank(edges("A" -> "B"), iters = 0))
    assert(r == Map("A" -> S, "B" -> S))
  }

  test("results are bit-identical at any parallelism") {
    val e = (0 until 500).flatMap { i =>
      Seq(s"h${i % 37}" -> s"h${(i * 7) % 37}", s"h${i % 37}" -> s"h${(i * 13) % 37}")
    }
    val r1 = ranksOf(LinkGraph.hostRank(edges(e: _*).repartition(1), iters = 3))
    val r7 = ranksOf(LinkGraph.hostRank(edges(e: _*).repartition(7), iters = 3))
    assert(r1 == r7)
    assert(r1.size == 37)
  }
}
