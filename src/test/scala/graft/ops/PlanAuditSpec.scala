package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan invariants the 100 TB design depends on, pinned as
  * tests so regressions fail loudly:
  *  - the headline covering-probe stage contains no ScalaUDF / Python
  *    eval (VERDICT r1 item 4's done-criterion),
  *  - covering joins stay shuffle-free (broadcast probe + explode only),
  *  - aggregation queries keep map-side partial aggregation,
  *  - parquet scans prune columns.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("plan-audit-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("covering joins: no ScalaUDF, no exchange in the probe stage") {
    for (q <- Seq("q_pip_city", "q_rect_join", "q_radius_100km",
      "q_pip_annulus", "q_pip_coast")) {
      val p = plan(q)
      assert(!p.contains("ScalaUDF"), s"$q probe must be a native expression")
      assert(!p.toLowerCase.contains("batchevalpython"), s"$q has python eval")
      assert(!p.contains("Exchange"), s"$q must stay a shuffle-free map join")
    }
  }

  test("cell aggregation: partial aggregation before the exchange") {
    val p = plan("q_cell_agg")
    // HashAggregate appears twice (partial + final) around one exchange
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final aggregation:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 2, "one agg exchange expected")
  }

  test("parquet scans prune to the needed columns") {
    val df = graft.SparkEntry.queries("q_dedup_exact")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // documents.parquet has (doc_id, text, ...); the dedup query needs
    // only those two
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang"), s"unpruned scan: $readSchema")
  }

  test("headline pipeline stays inside whole-stage codegen") {
    val df = graft.SparkEntry.queries("q_pip_city")(spark, dir)
    val codegen = org.apache.spark.sql.execution.debug
      .codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("WholeStageCodegen"),
      "probe stage must participate in whole-stage codegen")
  }
}
