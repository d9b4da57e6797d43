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
  }
}
