package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** PaddedCell vs Cell equivalences, entry/exit vertex chain continuity,
  * and ShrinkToFit, ported from paddedcell_test.go:25-200.
  */
class PaddedCellSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(86420)

  private def randomCellId(): Long = {
    val face = rng.nextInt(6)
    val level = rng.nextInt(CellId.MaxLevel + 1)
    val pos = (rng.nextLong() & (-1L >>> CellId.FaceBits)) &
      -CellId.lsbForLevel(level)
    CellId.parent((face.toLong << CellId.PosBits) | pos | 1L, level)
  }

  private def centerUV(id: Long): (Double, Double) = {
    val (_, i, j, _) = CellId.faceIJOrientation(CellId.rangeMin(id))
    val ijSize = CellId.sizeIJ(CellId.level(id))
    val iLo = i & -ijSize
    val jLo = j & -ijSize
    (STUV.stToUV(STUV.siTiToST(2L * iLo + ijSize)),
      STUV.stToUV(STUV.siTiToST(2L * jLo + ijSize)))
  }

  test("padded cell matches Cell bounds, middle, center, children") {
    for (_ <- 0 until 1000) {
      val cid = randomCellId()
      val padding = math.pow(1e-15, rng.nextDouble())
      val cell = Cell.fromId(cid)
      val p = PaddedCell.fromCellId(cid, padding)

      assert(p.id === cid)
      assert(p.level === CellId.level(cid))
      assert(p.padding === padding)
      val (uLo, uHi, vLo, vHi) = p.bound
      assert(uLo === cell.uLo - padding && uHi === cell.uHi + padding)
      assert(vLo === cell.vLo - padding && vHi === cell.vHi + padding)
      val (cu, cv) = centerUV(cid)
      val (mULo, mUHi, mVLo, mVHi) = p.middle
      assert(mULo === cu - padding && mUHi === cu + padding)
      assert(mVLo === cv - padding && mVHi === cv + padding)
      assert(p.center === CellId.toPoint(cid))

      if (!CellId.isLeaf(cid)) {
        val children = CellId.children(cid)
        for (pos <- 0 until 4) {
          val (i, j) = p.childIJ(pos)
          val pChild = p.childAt(i, j)
          val cChild = Cell.fromId(children(pos))
          assert(pChild.id === children(pos))
          assert(pChild.level === CellId.level(children(pos)))
          val (cuLo, cuHi, cvLo, cvHi) = pChild.bound
          assert(cuLo === cChild.uLo - padding && cuHi === cChild.uHi + padding)
          assert(cvLo === cChild.vLo - padding && cvHi === cChild.vHi + padding)
          assert(pChild.center === CellId.toPoint(children(pos)))
        }
      }
    }
  }

  test("entry/exit vertices: padding-independent, chain-continuous") {
    for (_ <- 0 until 1000) {
      val id = randomCellId()
      val unpadded = PaddedCell.fromCellId(id, 0)
      val padded = PaddedCell.fromCellId(id, 0.5)
      assert(unpadded.entryVertex === padded.entryVertex)
      assert(unpadded.exitVertex === padded.exitVertex)
      // exit of a cell == entry of the next cell on the curve (wraps)
      assert(PaddedCell.fromCellId(CellId.nextWrap(id), 0).entryVertex ===
        unpadded.exitVertex)
      if (!CellId.isLeaf(id)) {
        assert(PaddedCell.fromCellId(CellId.children(id)(0), 0).entryVertex ===
          unpadded.entryVertex)
        assert(PaddedCell.fromCellId(CellId.children(id)(3), 0).exitVertex ===
          unpadded.exitVertex)
      }
    }
  }

  test("shrinkToFit recovers the target cell (paddedcell_test.go:134)") {
    for (_ <- 0 until 1000) {
      val result = randomCellId()
      val cell = Cell.fromId(result)
      val sizeU = cell.uHi - cell.uLo
      val sizeV = cell.vHi - cell.vLo
      val maxPadding = 0.5 * math.min(sizeU, sizeV)
      val padding = rng.nextDouble() * maxPadding
      val mxLo = cell.uLo + padding; val mxHi = cell.uHi - padding
      val myLo = cell.vLo + padding; val myHi = cell.vHi - padding
      def uni(lo: Double, hi: Double) = lo + rng.nextDouble() * (hi - lo)
      var ax = uni(mxLo, mxHi); var ay = uni(myLo, myHi)
      var bx = uni(mxLo, mxHi); var by = uni(myLo, myHi)
      if (!CellId.isLeaf(result)) {
        val (cu, cv) = centerUV(result)
        val useY = rng.nextBoolean()
        val center = if (useY) cv else cu
        val sLo = math.max(center - padding, if (useY) myLo else mxLo)
        val sHi = math.min(center + padding, if (useY) myHi else mxHi)
        val mid = uni(sLo, sHi)
        if (useY) { ay = uni(myLo, mid); by = uni(mid, myHi) }
        else { ax = uni(mxLo, mid); bx = uni(mid, mxHi) }
      }
      val xLo = math.min(ax, bx); val xHi = math.max(ax, bx)
      val yLo = math.min(ay, by); val yHi = math.max(ay, by)
      val initial = CellId.parent(result, rng.nextInt(CellId.level(result) + 1))
      val p = PaddedCell.fromCellId(initial, padding)
      assert(p.shrinkToFit(xLo, xHi, yLo, yHi) === result,
        s"result ${CellId.toToken(result)} from ${CellId.toToken(initial)}")
    }
  }
}
