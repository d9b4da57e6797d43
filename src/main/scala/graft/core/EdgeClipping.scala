package graft.core

/** Robust clipping of geodesic edges to cube faces and of 2D edges to 2D
  * rectangles (/root/reference/s2/edge_clipping.go:15-690) — the kernel
  * that finds the cells a geodesic edge intersects, with exact
  * face-intersection tests and conservative error constants.
  */
object EdgeClipping {
  import Predicates.MachineEps

  /** Max error in a clipped u/v coordinate (edge_clipping.go:36-39). */
  final val EdgeClipErrorUVCoord = 2.25 * MachineEps
  final val EdgeClipErrorUVDist = 2.25 * MachineEps
  final val FaceClipErrorRadians = 3 * MachineEps
  final val FaceClipErrorUVDist = 9 * MachineEps
  final val FaceClipErrorUVCoord = 9.0 / math.sqrt(2.0) * MachineEps
  final val IntersectsRectErrorUVDist = 3 * math.sqrt(2.0) * MachineEps

  /** Face neighbors along (u, v, w) axes (stuv.go:416-424). */
  private val faceUVWFaces: Array[Array[Array[Int]]] = Array(
    Array(Array(4, 1), Array(5, 2), Array(3, 0)),
    Array(Array(0, 3), Array(5, 2), Array(4, 1)),
    Array(Array(0, 3), Array(1, 4), Array(5, 2)),
    Array(Array(2, 5), Array(1, 4), Array(0, 3)),
    Array(Array(2, 5), Array(3, 0), Array(1, 4)),
    Array(Array(4, 1), Array(3, 0), Array(2, 5)))

  def uvwFace(face: Int, axis: Int, direction: Int): Int =
    faceUVWFaces(face)(axis)(direction)

  /** Project p into the (u,v,w) frame of a face (stuv.go:312-328). */
  def faceXYZtoUVW(face: Int, p: Vec3): Vec3 = face match {
    case 0 => Vec3(p.y, p.z, p.x)
    case 1 => Vec3(-p.x, p.z, p.y)
    case 2 => Vec3(-p.x, -p.y, p.z)
    case 3 => Vec3(-p.z, -p.y, -p.x)
    case 4 => Vec3(-p.z, p.x, -p.y)
    case _ => Vec3(p.y, p.x, -p.z)
  }

  /** u + v == w exactly, via float identities (edge_clipping.go:180-186). */
  private def sumEqual(u: Double, v: Double, w: Double): Boolean =
    (u + v == w) && (u == w - v) && (v == w - u)

  /** Whether line L (normal n in face UVW coords) intersects the face:
    * |Nu| + |Nv| >= |Nw| evaluated exactly (edge_clipping.go:193-209).
    */
  def intersectsFace(n: Vec3): Boolean = {
    val u = math.abs(n.x)
    val v = math.abs(n.y)
    val w = math.abs(n.z)
    (v >= w - u) && (u >= w - v)
  }

  /** Whether L crosses two opposite edges of the face:
    * ||Nu| - |Nv|| >= |Nw| exactly (edge_clipping.go:215-235).
    */
  def intersectsOppositeEdges(n: Vec3): Boolean = {
    val u = math.abs(n.x)
    val v = math.abs(n.y)
    val w = math.abs(n.z)
    if (math.abs(u - v) != w) return math.abs(u - v) >= w
    if (u >= v) u - w >= v else v - w >= u
  }

  final val AxisU = 0
  final val AxisV = 1

  /** Which axis the directed line exits the face through
    * (edge_clipping.go:245-295).
    */
  def exitAxis(n: Vec3): Int = {
    if (intersectsOppositeEdges(n)) {
      return if (math.abs(n.x) >= math.abs(n.y)) AxisV else AxisU
    }
    def sb(d: Double) = if (d < 0 || (d == 0 && 1 / d < 0)) 1 else 0
    if ((sb(n.x) ^ sb(n.y) ^ sb(n.z)) == 0) AxisV else AxisU
  }

  /** UV point where the directed line exits the face along the axis
    * (edge_clipping.go:297-314).
    */
  def exitPoint(n: Vec3, axis: Int): (Double, Double) = {
    if (axis == AxisU) {
      val u = if (n.y > 0) 1.0 else -1.0
      (u, (-u * n.x - n.z) / n.y)
    } else {
      val v = if (n.x < 0) 1.0 else -1.0
      ((-v * n.y - n.z) / n.x, v)
    }
  }

  /** Clip endpoint B of segment AB onto the face; returns the clipped
    * (u,v) and the 0..3 intersection score (edge_clipping.go:316-380).
    */
  private def clipDestination(a: Vec3, b: Vec3, scaledN: Vec3, aTan: Vec3,
                              bTan: Vec3, scaleUV: Double): (Double, Double, Int) = {
    val maxSafeUVCoord = 1 - FaceClipErrorUVCoord
    if (b.z > 0) {
      val u = b.x / b.z
      val v = b.y / b.z
      if (math.max(math.abs(u), math.abs(v)) <= maxSafeUVCoord)
        return (u, v, 0)
    }
    val (eu, ev) = exitPoint(scaledN, exitAxis(scaledN))
    var uvX = eu * scaleUV
    var uvY = ev * scaleUV
    val p = Vec3(uvX, uvY, 1.0)
    var score = 0
    if ((p - a).dot(aTan) < 0) score = 2 // wrong side of A
    else if ((p - b).dot(bTan) < 0) score = 1 // wrong side of B
    if (score > 0) {
      if (b.z <= 0) score = 3 // B cannot be projected onto this face
      else { uvX = b.x / b.z; uvY = b.y / b.z }
    }
    (uvX, uvY, score)
  }

  /** Clip edge AB to the padded face [-R,R]x[-R,R], R = 1 + padding;
    * returns (aU, aV, bU, bV) or None when AB misses the face (exact
    * rejection) (edge_clipping.go:77-141).
    */
  def clipToPaddedFace(a: Vec3, b: Vec3, f: Int,
                       padding: Double): Option[(Double, Double, Double, Double)] = {
    if (STUV.face(a.x, a.y, a.z) == f && STUV.face(b.x, b.y, b.z) == f) {
      val au = STUV.validFaceXYZtoU(f, a.x, a.y, a.z)
      val av = STUV.validFaceXYZtoV(f, a.x, a.y, a.z)
      val bu = STUV.validFaceXYZtoU(f, b.x, b.y, b.z)
      val bv = STUV.validFaceXYZtoV(f, b.x, b.y, b.z)
      return Some((au, av, bu, bv))
    }
    // normal MUST be computed in xyz (symbolic perturbation consistency)
    var normUVW = faceXYZtoUVW(f, EdgeCrossings.pointCross(a, b))
    val aUVW = faceXYZtoUVW(f, a)
    val bUVW = faceXYZtoUVW(f, b)

    val scaleUV = 1 + padding
    val scaledN = Vec3(scaleUV * normUVW.x, scaleUV * normUVW.y, normUVW.z)
    if (!intersectsFace(scaledN)) return None

    // guard against underflow in Normalize for tiny normals
    if (math.max(math.abs(normUVW.x),
      math.max(math.abs(normUVW.y), math.abs(normUVW.z))) < math.pow(2, -511))
      normUVW = normUVW * math.pow(2, 563)
    normUVW = normUVW.normalize

    val aTan = normUVW.cross(aUVW)
    val bTan = bUVW.cross(normUVW)

    val (au, av, aScore) =
      clipDestination(bUVW, aUVW, scaledN * -1, bTan, aTan, scaleUV)
    val (bu, bv, bScore) =
      clipDestination(aUVW, bUVW, scaledN, aTan, bTan, scaleUV)
    if (aScore + bScore < 3) Some((au, av, bu, bv)) else None
  }

  /** ClipToFace with zero padding (edge_clipping.go:69-74). */
  def clipToFace(a: Vec3, b: Vec3, face: Int): Option[(Double, Double, Double, Double)] =
    clipToPaddedFace(a, b, face, 0.0)

  // --- 2D clipping ---------------------------------------------------

  /** Interpolation preserving endpoint identities
    * (edge_clipping.go:489-510).
    */
  def interpolateDouble(x: Double, a: Double, b: Double,
                        a1: Double, b1: Double): Double = {
    if (a == b) return a1
    if (math.abs(a - x) <= math.abs(b - x)) a1 + (b1 - a1) * (x - a) / (b - a)
    else b1 + (a1 - b1) * (x - b) / (a - b)
  }

  private def updateEndpoint(lo: Double, hi: Double, highEndpoint: Boolean,
                             value: Double): Option[(Double, Double)] = {
    if (!highEndpoint) {
      if (hi < value) return None
      if (lo < value) return Some((value, hi))
      Some((lo, hi))
    } else {
      if (lo > value) return None
      if (hi > value) return Some((lo, value))
      Some((lo, hi))
    }
  }

  private def clipBoundAxis(a0: Double, b0: Double, bound0: (Double, Double),
                            a1: Double, b1: Double, bound1: (Double, Double),
                            negSlope: Boolean,
                            clip: (Double, Double)): Option[((Double, Double), (Double, Double))] = {
    var b0v = bound0
    var b1v = bound1
    if (b0v._1 < clip._1) {
      if (b0v._2 < clip._1) return None
      b0v = (clip._1, b0v._2)
      updateEndpoint(b1v._1, b1v._2, negSlope,
        interpolateDouble(clip._1, a0, b0, a1, b1)) match {
        case Some(u) => b1v = u
        case None => return None
      }
    }
    if (b0v._2 > clip._2) {
      if (b0v._1 > clip._2) return None
      b0v = (b0v._1, clip._2)
      updateEndpoint(b1v._1, b1v._2, !negSlope,
        interpolateDouble(clip._2, a0, b0, a1, b1)) match {
        case Some(u) => b1v = u
        case None => return None
      }
    }
    Some((b0v, b1v))
  }

  /** Bounding box of edge AB clipped to `clip`; None when disjoint.
    * Intervals are (lo, hi); clip rect is (xLo, xHi, yLo, yHi)
    * (edge_clipping.go:464-486).
    */
  def clipEdgeBound(ax: Double, ay: Double, bx: Double, by: Double,
                    clipX: (Double, Double), clipY: (Double, Double)):
      Option[((Double, Double), (Double, Double))] = {
    val boundX = (math.min(ax, bx), math.max(ax, bx))
    val boundY = (math.min(ay, by), math.max(ay, by))
    val negSlope = (ax > bx) != (ay > by)
    clipBoundAxis(ax, bx, boundX, ay, by, boundY, negSlope, clipX) match {
      case None => None
      case Some((b0x, b0y)) =>
        clipBoundAxis(ay, by, b0y, ax, bx, b0x, negSlope, clipY) match {
          case None => None
          case Some((b1y, b1x)) => Some((b1x, b1y))
        }
    }
  }

  /** The portion of 2D edge AB inside the clip rect, as endpoints ordered
    * from A to B; None when disjoint (edge_clipping.go:143-166).
    */
  def clipEdge(ax: Double, ay: Double, bx: Double, by: Double,
               clipX: (Double, Double), clipY: (Double, Double)):
      Option[(Double, Double, Double, Double)] = {
    clipEdgeBound(ax, ay, bx, by, clipX, clipY).map { case ((xLo, xHi), (yLo, yHi)) =>
      val aiX = if (ax > bx) xHi else xLo
      val aiY = if (ay > by) yHi else yLo
      val biX = if (ax > bx) xLo else xHi
      val biY = if (ay > by) yLo else yHi
      (aiX, aiY, biX, biY)
    }
  }

  /** Whether 2D edge AB intersects the closed rect, within the error
    * bound (edge_clipping.go:425-446).
    */
  def edgeIntersectsRect(ax: Double, ay: Double, bx: Double, by: Double,
                         xLo: Double, xHi: Double, yLo: Double, yHi: Double): Boolean = {
    if (math.max(ax, bx) < xLo || math.min(ax, bx) > xHi ||
      math.max(ay, by) < yLo || math.min(ay, by) > yHi) return false
    // ortho of (b - a): (-dy, dx)
    val nx = -(by - ay)
    val ny = bx - ax
    val i = if (nx >= 0) 1 else 0
    val j = if (ny >= 0) 1 else 0
    def vx(k: Int) = if (k == 1) xHi else xLo
    def vy(k: Int) = if (k == 1) yHi else yLo
    val maxD = nx * (vx(i) - ax) + ny * (vy(j) - ay)
    val minD = nx * (vx(1 - i) - ax) + ny * (vy(1 - j) - ay)
    maxD >= 0 && minD <= 0
  }

  /** An edge AB clipped to one cube face: (face, aU, aV, bU, bV). */
  final case class FaceSegment(face: Int, aU: Double, aV: Double,
                               bU: Double, bV: Double)

  /** Subdivide AB at every cube-face boundary it crosses; segments form
    * a continuous path from A to B (edge_clipping.go:512-585).
    */
  def faceSegments(a: Vec3, b: Vec3): Seq[FaceSegment] = {
    var aFace = STUV.face(a.x, a.y, a.z)
    var bFace = STUV.face(b.x, b.y, b.z)
    var aU = STUV.validFaceXYZtoU(aFace, a.x, a.y, a.z)
    var aV = STUV.validFaceXYZtoV(aFace, a.x, a.y, a.z)
    var bU = STUV.validFaceXYZtoU(bFace, b.x, b.y, b.z)
    var bV = STUV.validFaceXYZtoV(bFace, b.x, b.y, b.z)
    if (aFace == bFace) return Seq(FaceSegment(aFace, aU, aV, bU, bV))

    val ab = EdgeCrossings.pointCross(a, b)
    val (aFace2, aU2, aV2) = moveOriginToValidFace(aFace, a, ab, aU, aV)
    val (bFace2, bU2, bV2) = moveOriginToValidFace(bFace, b, ab * -1, bU, bV)
    aFace = aFace2; aU = aU2; aV = aV2
    bFace = bFace2; bU = bU2; bV = bV2

    val segments = scala.collection.mutable.ArrayBuffer[FaceSegment]()
    var face = aFace
    var segAU = aU
    var segAV = aV
    while (face != bFace) {
      val n = faceXYZtoUVW(face, ab)
      val axis = exitAxis(n)
      val (exU, exV) = exitPoint(n, axis)
      segments += FaceSegment(face, segAU, segAV, exU, exV)
      val exitXyz = STUV.faceUVToXYZ(face, exU, exV)
      face = nextFace(face, exU, exV, axis, n, bFace)
      val exitUvw = faceXYZtoUVW(face, exitXyz)
      segAU = exitUvw.x
      segAV = exitUvw.y
    }
    segments += FaceSegment(face, segAU, segAV, bU, bV)
    segments.toSeq
  }

  private def moveOriginToValidFace(face0: Int, a: Vec3, ab: Vec3,
                                    aU0: Double, aV0: Double): (Int, Double, Double) = {
    var face = face0
    var aU = aU0
    var aV = aV0
    val maxSafeUVCoord = 1 - FaceClipErrorUVCoord
    if (math.max(math.abs(aU), math.abs(aV)) <= maxSafeUVCoord)
      return (face, aU, aV)
    val n = faceXYZtoUVW(face, ab)
    if (intersectsFace(n)) {
      val (eu, ev) = exitPoint(n, exitAxis(n))
      val exit = STUV.faceUVToXYZ(face, eu, ev)
      val aTangent = ab.normalize.cross(a)
      if ((exit - a).dot(aTangent) >= -FaceClipErrorRadians)
        return (face, aU, aV)
    }
    if (math.abs(aU) >= math.abs(aV)) {
      face = uvwFace(face, 0, if (aU > 0) 1 else 0)
    } else {
      face = uvwFace(face, 1, if (aV > 0) 1 else 0)
    }
    aU = math.max(-1.0, math.min(1.0, STUV.validFaceXYZtoU(face, a.x, a.y, a.z)))
    aV = math.max(-1.0, math.min(1.0, STUV.validFaceXYZtoV(face, a.x, a.y, a.z)))
    (face, aU, aV)
  }

  private def nextFace(face: Int, exitU: Double, exitV: Double, axis: Int,
                       n: Vec3, targetFace: Int): Int = {
    var exitA = exitU
    var exit1MinusA = exitV
    if (axis == AxisV) { exitA = exitV; exit1MinusA = exitU }
    val exitAPos = if (exitA > 0) 1 else 0
    val exit1MinusAPos = if (exit1MinusA > 0) 1 else 0
    if (math.abs(exit1MinusA) == 1 &&
      uvwFace(face, 1 - axis, exit1MinusAPos) == targetFace &&
      sumEqual(exitU * n.x, exitV * n.y, -n.z))
      return targetFace
    uvwFace(face, axis, exitAPos)
  }
}
