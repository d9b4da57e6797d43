package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** String-payload bounded top-k: buffer fuzz vs sort-take-k, merge-order
  * invariance, BYTEWISE tie-break semantics (incl. the supplementary-
  * plane case where UTF-16 order diverges), and DataFrame-level equality
  * with a window at any parallelism — which exercises partial
  * aggregation, serialize/deserialize, and the reused-row clone.
  */
class TopKStringsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("topkstrings-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def u8(s: String) = UTF8String.fromString(s)

  test("buffer fuzz: any insert sequence equals sort-take-k") {
    val rng = new scala.util.Random(41)
    val vocab = Vector("a", "ab", "b", "ba", "c", "", "aa", "z")
    for (trial <- 0 until 300) {
      val k = 1 + rng.nextInt(8)
      val n = rng.nextInt(40)
      val entries = Seq.fill(n)((rng.nextInt(5).toLong, vocab(rng.nextInt(vocab.size))))
      val buf = new TopKStrBuffer(k)
      entries.foreach { case (s, t) => buf.insert(s, u8(t)) }
      val got = (0 until buf.n).map(i => (buf.scores(i), buf.strs(i).toString)).toList
      val want = entries.sortBy { case (s, t) => (-s, t) }.take(k).toList
      assert(got == want, s"trial $trial k=$k entries=$entries")
    }
  }

  test("merge order never changes the result") {
    val rng = new scala.util.Random(43)
    val vocab = Vector("x", "xy", "y", "yz", "z")
    for (trial <- 0 until 50) {
      val k = 1 + rng.nextInt(5)
      val entries = Seq.fill(30)((rng.nextInt(6).toLong, vocab(rng.nextInt(vocab.size))))
      val whole = new TopKStrBuffer(k)
      entries.foreach { case (s, t) => whole.insert(s, u8(t)) }
      val parts = entries.grouped(7).map { chunk =>
        val b = new TopKStrBuffer(k)
        chunk.foreach { case (s, t) => b.insert(s, u8(t)) }
        b
      }.toSeq
      val merged = new TopKStrBuffer(k)
      for (p <- rng.shuffle(parts); i <- 0 until p.n)
        merged.insert(p.scores(i), p.strs(i))
      assert((0 until merged.n).map(i => (merged.scores(i), merged.strs(i).toString)) ==
        (0 until whole.n).map(i => (whole.scores(i), whole.strs(i).toString)),
        s"trial $trial")
    }
  }

  test("tie-break is bytewise UTF-8, not UTF-16 code units") {
    // U+FFFD is EF BF BD in UTF-8; U+10000 is F0 90 80 80. Bytewise,
    // U+FFFD ranks first; UTF-16 code-unit order (java String compareTo)
    // would say the opposite (D800 < FFFD).
    val supp = new String(Character.toChars(0x10000))
    assert("�".compareTo(supp) > 0, "sanity: UTF-16 order diverges")
    val buf = new TopKStrBuffer(2)
    buf.insert(1L, u8(supp))
    buf.insert(1L, u8("�"))
    assert(buf.strs(0).toString == "�" && buf.strs(1).toString == supp)
  }

  test("DataFrame aggregate equals the window at any parallelism") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    val rows = Seq.fill(3000)((s"g${rng.nextInt(4)}", s"w${rng.nextInt(60)}"))
    val df = rows.toDF("g", "w")
    def viaAgg(parts: Int) =
      df.repartition(parts)
        .groupBy("g", "w").agg(count(lit(1)).cast("long").as("cnt"))
        .groupBy("g")
        .agg(TopKStrings.topKStrs(col("cnt"), col("w"), 5).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), col("col.str"), col("col.score"),
          (col("pos") + 1).as("r"))
        .collect().map(_.toSeq).toSet
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy("g")
        .orderBy(col("cnt").desc, col("w").asc)
      df.groupBy("g", "w").agg(count(lit(1)).cast("long").as("cnt"))
        .withColumn("r", row_number().over(win))
        .filter(col("r") <= 5)
        .select(col("g"), col("w"), col("cnt"), col("r").cast("int"))
        .collect().map(_.toSeq).toSet
    }
    assert(viaAgg(1) == viaWindow)
    assert(viaAgg(9) == viaWindow)
  }

  test("k larger than the group returns the whole group, ordered") {
    import spark.implicits._
    val out = Seq(("g", 2L, "b"), ("g", 2L, "a"), ("g", 5L, "z"))
      .toDF("g", "cnt", "w")
      .groupBy("g")
      .agg(TopKStrings.topKStrs(col("cnt"), col("w"), 10).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.score"), col("e.str"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(out == List((5L, "z"), (2L, "a"), (2L, "b")))
  }
}
