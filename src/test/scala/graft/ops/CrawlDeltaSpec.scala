package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Crawl-snapshot diff: status classification, unchanged suppression,
  * hash payload semantics, and the no-text-shuffle plan contract.
  */
class CrawlDeltaSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("crawldelta-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def snap(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("url", "text")
  }

  test("classifies added, deleted, changed; suppresses unchanged") {
    val prev = snap("u1" -> "same", "u2" -> "old body", "u3" -> "going away")
    val next = snap("u1" -> "same", "u2" -> "new body", "u4" -> "brand new")
    val out = CrawlDelta.crawlDelta(prev, next, "url", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("u2" -> "changed", "u3" -> "deleted", "u4" -> "added"))
  }

  test("new_sha carries the next snapshot's hash, NULL for deletions") {
    val prev = snap("u1" -> "a", "u2" -> "b")
    val next = snap("u1" -> "a2")
    val rows = CrawlDelta.crawlDelta(prev, next, "url", "text").collect()
      .map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(rows("u2").isEmpty, "deleted rows have no new hash")
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("a2".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows("u1").contains(expected))
  }

  test("identical snapshots produce an empty delta") {
    val a = snap("u1" -> "x", "u2" -> "y")
    assert(CrawlDelta.crawlDelta(a, a, "url", "text").count() == 0L)
  }

  test("text bytes never shuffle: exchanges carry only url and sha") {
    val prev = snap("u1" -> ("long body " * 50), "u2" -> "b")
    val next = snap("u1" -> "changed", "u3" -> "added")
    val plan = CrawlDelta.crawlDelta(prev, next, "url", "text")
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      val names = e.child.output.map(_.name.toLowerCase)
      assert(!names.contains("text"),
        s"exchange must not carry raw text, saw: $names")
    }
  }
}
