package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the full s2_* SQL surface available in a
  * session built with spark.sql.extensions — the spark-submit deployment
  * path, with no driver-side registration code.
  *
  * This spec owns its session lifecycle: it stops whatever shared
  * session exists and leaves a clean slate (suites run serially).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects every s2_* function") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("extensions-spec")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val tok = spark.sql(
        "SELECT s2_token(s2_parent(s2_cellid(48.8566d, 2.3522d), 6))")
        .collect()(0).getString(0)
      val want = graft.core.CellId.toToken(graft.core.CellId.parent(
        graft.core.CellId.fromLatLngDegrees(48.8566, 2.3522), 6))
      assert(tok === want)

      val row = spark.sql(
        """SELECT s2_face(s2_cellid(0.0d, 0.0d)),
          |  s2_level(s2_parent(s2_cellid(1.0d, 2.0d), 12)),
          |  size(s2_neighbors(s2_parent(s2_cellid(1.0d, 2.0d), 10), 10)),
          |  tile_x(2.3522d, 12), tile_y(48.8566d, 12),
          |  geo_lat('x geo:48.85,2.35 y'),
          |  s2_distance(0.0d, 0.0d, 0.0d, 90.0d)""".stripMargin).collect()(0)
      assert(row.getInt(0) === 0)
      assert(row.getInt(1) === 12)
      assert(row.getInt(2) === 8)
      assert(row.getLong(3) === graft.core.WebMercator.tileX(2.3522, 12))
      assert(row.getLong(4) === graft.core.WebMercator.tileY(48.8566, 12))
      assert(math.abs(row.getDouble(5) - 48.85) < 1e-12)
      assert(math.abs(row.getDouble(6) - math.Pi / 2) < 1e-12)

      // text-hash surface: values must equal the Scala kernels
      val th = spark.sql(
        """SELECT simhash64('a b c'),
          |  jaccard_sorted(shingle_hashes('a b c d', 3), shingle_hashes('a b c e', 3)),
          |  size(minhash_sig('a b c d e', 3, 16, 42)),
          |  band_key(minhash_sig('a b c d e', 3, 16, 42), 2, 4)""".stripMargin)
        .collect()(0)
      assert(th.getLong(0) === graft.ops.Dedup.simHash("a b c"))
      assert(th.getDouble(1) === graft.ops.Dedup.ngramJaccard("a b c d", "a b c e", 3))
      assert(th.getInt(2) === 16)

      // bounded top-k aggregate from pure SQL
      val agg = spark.sql(
        """SELECT g, top_k_ids(s, id, 2) FROM VALUES
          |  ('a', 1.0d, 10L), ('a', 3.0d, 11L), ('a', 2.0d, 12L),
          |  ('b', 5.0d, 20L) AS t(g, s, id)
          |GROUP BY g ORDER BY g""".stripMargin).collect()
      assert(agg(0).getSeq[Long](1) === Seq(11L, 12L))
      assert(agg(1).getSeq[Long](1) === Seq(20L))

      // NFC normalization from pure SQL (decomposed -> composed); the
      // combining mark is embedded directly — Spark's chr() is
      // ASCII-mod-256, unlike DuckDB's codepoint chr()
      val nrm = spark.sql("SELECT nfc_normalize('café')")
        .collect()(0).getString(0)
      assert(nrm == "café")

      // string-payload top-k aggregate from pure SQL
      val sagg = spark.sql(
        """SELECT top_k_strs(c, w, 2) FROM VALUES
          |  (3L, 'beta'), (3L, 'alpha'), (9L, 'gamma') AS t(c, w)""".stripMargin)
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(sagg.map(r => (r.getLong(0), r.getString(1))) ===
        Seq((9L, "gamma"), (3L, "alpha")))

      // SQ8 integer dot from pure SQL
      val i8 = spark.sql(
        "SELECT vec_dot_i8(array(1, -2, 3), array(4, 5, 6))")
        .collect()(0).getLong(0)
      assert(i8 == 4L - 10L + 18L)

      // bloom build from pure SQL; probe the bytes with the kernel
      val bloomBytes = spark.sql(
        """SELECT bloom_agg(u, 1024L, 5) FROM VALUES
          |  ('https://a.test/'), ('https://b.test/') AS t(u)""".stripMargin)
        .collect()(0).getAs[Array[Byte]](0)
      val words = BloomStatics.wordsFromBytes(bloomBytes)
      import org.apache.spark.unsafe.types.UTF8String
      assert(BloomStatics.mightContain(words, 1024L, 5,
        UTF8String.fromString("https://a.test/")))
      assert(!BloomStatics.mightContain(words, 1024L, 5,
        UTF8String.fromString("https://never-added.test/")))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
