package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** CellUnion protocols from cellunion_test.go not already covered by
  * CovererSpec: the leafCellsCovered golden table and the
  * expandByRadius covering fuzz (an expanded covering must cover the
  * expanded cap).
  */
class CellUnionProtocolSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(404)

  test("leafCellsCovered golden table") {
    def cu(ids: Long*) = CellUnion.normalized(ids.toArray)
    assert(cu().leafCellsCovered === 0L)
    val leaf0 = CellId.childBeginAtLevel(CellId.fromFace(0), CellId.MaxLevel)
    assert(cu(leaf0).leafCellsCovered === 1L)
    assert(cu(leaf0, CellId.fromFace(0)).leafCellsCovered === (1L << 60))
    val fiveFaces = cu(CellId.fromFace(0)).expandAtLevel(0)
    assert(fiveFaces.leafCellsCovered === (5L << 60))
    val wholeWorld = fiveFaces.expandAtLevel(0)
    assert(wholeWorld.leafCellsCovered === (6L << 60))
    val mixed = cu(
      leaf0, CellId.fromFace(0),
      CellId.childBeginAtLevel(CellId.fromFace(1), 1),
      CellId.childBeginAtLevel(CellId.fromFace(2), 2),
      CellId.prev(CellId.childEndAtLevel(CellId.fromFace(2), 2)),
      CellId.childBeginAtLevel(CellId.fromFace(3), 14),
      CellId.childBeginAtLevel(CellId.fromFace(4), 27),
      CellId.prev(CellId.childEndAtLevel(CellId.fromFace(4), 15)),
      CellId.childBeginAtLevel(CellId.fromFace(5), 30))
    assert(mixed.leafCellsCovered ===
      1L + (1L << 6) + (1L << 30) + (1L << 32) + (2L << 56) + (1L << 58) +
        (1L << 60))
  }

  test("expandByRadius covers the expanded cap (TestCellUnionExpand)") {
    for (_ <- 0 until 120) {
      val center = Vec3(rng.nextGaussian(), rng.nextGaussian(),
        rng.nextGaussian()).normalize
      val radius = 1e-4 + rng.nextDouble() * 0.3
      val cap = {
        val s = math.sin(radius / 2); Cap(center, 4 * s * s)
      }
      val covering = RegionCoverer(maxCells = 1 + rng.nextInt(10)).covering(cap)
      val extra = rng.nextDouble() * 0.2
      val maxLevelDiff = rng.nextInt(8)
      val expanded = covering.expandByRadius(extra, maxLevelDiff)
      // sample points within radius + extra of the center must be covered
      val t1 = center.ortho
      val t2 = center.cross(t1)
      for (_ <- 0 until 40) {
        val r = (radius + extra) * 0.98 * math.sqrt(rng.nextDouble())
        val a = rng.nextDouble() * 2 * math.Pi
        val p = (center * math.cos(r) +
          (t1 * math.cos(a) + t2 * math.sin(a)) * math.sin(r)).normalize
        assert(expanded.containsCellId(CellId.fromPoint(p.x, p.y, p.z)),
          s"expanded covering missed a point at angle $r of ${radius + extra}")
      }
      // and the expansion is monotone: everything covered before remains
      covering.ids.foreach(id =>
        assert(expanded.intersectsCellId(id), "expansion must not shrink"))
    }
  }
}
