package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injection point: registers every graft SQL
  * function at session build time, so
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes `SELECT s2_cellid(...)`
  * available in every session of a cluster without driver-side setup
  * code — the deployment story for spark-submit at fleet scale
  * (SURVEY.md §4 "custom Catalyst machinery").
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def add1(ext: SparkSessionExtensions, name: String,
                   f: Expression => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name),
      (es: Seq[Expression]) => f(es.head)))

  private def add2(ext: SparkSessionExtensions, name: String,
                   f: (Expression, Expression) => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name),
      (es: Seq[Expression]) => f(es(0), es(1))))

  override def apply(ext: SparkSessionExtensions): Unit = {
    add2(ext, "s2_cellid", S2CellIdExpr)
    add2(ext, "s2_parent", S2ParentExpr)
    add1(ext, "s2_level", S2LevelExpr)
    add1(ext, "s2_token", S2TokenExpr)
    add1(ext, "s2_from_token", S2FromTokenExpr)
    add1(ext, "s2_lat", S2LatExpr)
    add1(ext, "s2_lng", S2LngExpr)
    add1(ext, "s2_face", S2FaceExpr)
    add2(ext, "s2_i", S2CellIExpr)
    add2(ext, "s2_j", S2CellJExpr)
    add1(ext, "s2_range_min", S2RangeMinExpr)
    add1(ext, "s2_range_max", S2RangeMaxExpr)
    add2(ext, "s2_cell_contains", S2CellContainsExpr)
    add2(ext, "s2_neighbors", S2NeighborsExpr)
    add2(ext, "s2_cells_at", S2CellsAtExpr)
    add2(ext, "vec_dot", VecDotExpr)
    add1(ext, "vec_norm2", VecNorm2Expr)
    add2(ext, "tile_x", TileXExpr)
    add2(ext, "tile_y", TileYExpr)
    add1(ext, "geo_lat", GeoLatExpr)
    add1(ext, "geo_lng", GeoLngExpr)
    ext.injectFunction((FunctionIdentifier("s2_distance"), info("s2_distance"),
      (es: Seq[Expression]) => S2DistanceExpr(es.toList)))
    ext.injectFunction((FunctionIdentifier("s2_snap_cell"), info("s2_snap_cell"),
      (es: Seq[Expression]) => S2SnapCellExpr(es(0), es(1), es(2))))

    // Text-hash / dedup surface. Config parameters are expression
    // constants, so they must arrive as foldable literals in SQL.
    add1(ext, "simhash64", SimHash64Expr)
    add1(ext, "nfc_normalize", NfcNormalizeExpr)
    add2(ext, "jaccard_sorted", SortedJaccardExpr)
    ext.injectFunction((FunctionIdentifier("shingle_hashes"), info("shingle_hashes"),
      (es: Seq[Expression]) => ShingleHashesExpr(es(0), litInt(es(1), "shingle_hashes(_, n)"))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (es: Seq[Expression]) => MinHashSigExpr(es(0),
        litInt(es(1), "minhash_sig shingleSize"),
        litInt(es(2), "minhash_sig numHashes"),
        litLong(es(3), "minhash_sig seed"))))
    ext.injectFunction((FunctionIdentifier("band_key"), info("band_key"),
      (es: Seq[Expression]) => BandKeyExpr(es(0), es(1),
        litInt(es(2), "band_key rowsPerBand"))))
    // bounded top-k aggregate: SELECT top_k_ids(score, id, 3) ... GROUP BY g
    // (the analyzer wraps the returned AggregateFunction itself)
    ext.injectFunction((FunctionIdentifier("top_k_ids"), info("top_k_ids"),
      (es: Seq[Expression]) => TopKByScore(es(0), es(1),
        litInt(es(2), "top_k_ids k"))))
    // string-payload variant: SELECT top_k_strs(cnt, token, 20) ... GROUP BY g
    ext.injectFunction((FunctionIdentifier("top_k_strs"), info("top_k_strs"),
      (es: Seq[Expression]) => TopKStrings(es(0), es(1),
        litInt(es(2), "top_k_strs k"))))
    // SQ8 integer dot: SELECT vec_dot_i8(a_codes, b_codes)
    add2(ext, "vec_dot_i8", VecDotIntExpr)
    // bloom build: SELECT bloom_agg(url, 2097152, 7) (probe needs a
    // broadcast handle, so it stays a Column API: Bloom.bloomProbe)
    ext.injectFunction((FunctionIdentifier("bloom_agg"), info("bloom_agg"),
      (es: Seq[Expression]) => BloomAggregate(es(0),
        litLong(es(1), "bloom_agg mBits"), litInt(es(2), "bloom_agg k"))))
  }

  private def litInt(e: Expression, what: String): Int = litLong(e, what).toInt

  private def litLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal constant")
    e.eval(null) match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
      case s: java.lang.Short => s.longValue
      case b: java.lang.Byte => b.longValue
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }
}
