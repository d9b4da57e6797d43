package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** STUV kernel protocols from stuv_test.go: the xyzToFaceSiTi level
  * detection sweep (cell centers detect their level and reconstruct
  * their id; perturbed points lose the level but keep face/si/ti), the
  * siTi/ST and face round trips, and uv-norm orthogonality.
  */
class StuvProtocolSpec extends AnyFunSuite {
  import PointCompression.{xyzToFaceSiTi, faceSiTiToXYZ}

  private val rng = new scala.util.Random(5151)

  private def randomCellIdAt(level: Int): Long = {
    val p = Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()).normalize
    CellId.parent(CellId.fromPoint(p.x, p.y, p.z), level)
  }

  test("xyzToFaceSiTi detects levels of cell centers (stuv_test sweep)") {
    for (level <- 0 until CellId.MaxLevel by 3; _ <- 0 until 120) {
      val ci = randomCellIdAt(level)
      val center = CellId.toPoint(ci)
      val r = xyzToFaceSiTi(center)
      assert(r.level === level, s"level of ${CellId.toToken(ci)}")
      val gotId = CellId.parent(
        CellId.fromFaceIJ(r.face, (r.si / 2).toInt, (r.ti / 2).toInt), level)
      assert(gotId === ci, "face/si/ti must reconstruct the cell id")
      // a nearby non-center point keeps face/si/ti but loses the level
      val moved = (center + Vec3(1e-13, 1e-13, 1e-13)).normalize
      val rm = xyzToFaceSiTi(moved)
      assert(rm.level === -1, "perturbed point must not claim a level")
      assert((rm.face, rm.si, rm.ti) === ((r.face, r.si, r.ti)))
    }
  }

  test("faceSiTiToXYZ round trips at masked levels") {
    val maxSiTi = 1L << (CellId.MaxLevel + 1)
    for (level <- 0 to CellId.MaxLevel by 5; _ <- 0 until 60) {
      val face = rng.nextInt(6)
      val mask = -1L << (CellId.MaxLevel - level)
      def randSiTi(): Long = {
        var v = (rng.nextInt() & 0xFFFFFFFFL) & mask
        while (v > maxSiTi) v = (rng.nextInt() & 0xFFFFFFFFL) & mask
        v
      }
      val si = randSiTi(); val ti = randSiTi()
      val p = faceSiTiToXYZ(face, si, ti)
      val r = xyzToFaceSiTi(p)
      // an even si/ti at this mask is a center at SOME level <= level+1;
      // the reconstruction must at least be exact in (face, si, ti)
      assert(r.face === face || si == 0 || ti == 0 || si == maxSiTi || ti == maxSiTi)
      if (r.face == face) assert((r.si, r.ti) === ((si, ti)))
    }
  }

  test("siTi <-> ST round trip (TestSiTiSTRoundtrip)") {
    for (_ <- 0 until 2000) {
      val si = rng.nextLong().abs % (1L << 31)
      assert(STUV.stToSiTi(STUV.siTiToST(si)) === si)
    }
  }

  test("uNorm/vNorm are orthogonal to the face axes") {
    for (face <- 0 until 6; _ <- 0 until 50) {
      val u = rng.nextDouble() * 2 - 1
      val v = rng.nextDouble() * 2 - 1
      // every point on the line of constant u lies on the uNorm plane
      val p1 = STUV.faceUVToXYZ(face, u, -1)
      val p2 = STUV.faceUVToXYZ(face, u, 1)
      val n = STUV.uNorm(face, u)
      assert(math.abs(n.dot(p1)) < 1e-14 && math.abs(n.dot(p2)) < 1e-14,
        s"uNorm face $face")
      val q1 = STUV.faceUVToXYZ(face, -1, v)
      val q2 = STUV.faceUVToXYZ(face, 1, v)
      val m = STUV.vNorm(face, v)
      assert(math.abs(m.dot(q1)) < 1e-14 && math.abs(m.dot(q2)) < 1e-14,
        s"vNorm face $face")
    }
  }

  test("face assignment is consistent with faceUVToXYZ (TestSTUVFace)") {
    for (face <- 0 until 6; _ <- 0 until 200) {
      val u = rng.nextDouble() * 1.98 - 0.99
      val v = rng.nextDouble() * 1.98 - 0.99
      val p = STUV.faceUVToXYZ(face, u, v)
      assert(STUV.face(p.x, p.y, p.z) === face)
    }
  }
}
