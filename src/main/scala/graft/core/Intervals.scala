package graft.core

/** Flat closed interval on the real line (/root/reference/r1/interval.go).
  * Empty is represented as Lo > Hi (canonically [1,0]).
  */
final case class R1Interval(lo: Double, hi: Double) {
  def isEmpty: Boolean = lo > hi
  def center: Double = 0.5 * (lo + hi)
  def length: Double = hi - lo
  def contains(p: Double): Boolean = lo <= p && p <= hi
  def interiorContains(p: Double): Boolean = lo < p && p < hi
  def containsInterval(o: R1Interval): Boolean =
    if (o.isEmpty) true else lo <= o.lo && o.hi <= hi
  def intersects(o: R1Interval): Boolean =
    if (lo <= o.lo) o.lo <= hi && o.lo <= o.hi else lo <= o.hi && lo <= hi
  def interiorIntersects(o: R1Interval): Boolean =
    o.lo < hi && lo < o.hi && lo < hi && o.lo <= o.hi

  def addPoint(p: Double): R1Interval =
    if (isEmpty) R1Interval(p, p)
    else if (p < lo) R1Interval(p, hi)
    else if (p > hi) R1Interval(lo, p)
    else this

  def expanded(margin: Double): R1Interval =
    if (isEmpty) this else R1Interval(lo - margin, hi + margin)

  def union(o: R1Interval): R1Interval =
    if (isEmpty) o
    else if (o.isEmpty) this
    else R1Interval(math.min(lo, o.lo), math.max(hi, o.hi))

  def intersection(o: R1Interval): R1Interval =
    R1Interval(math.max(lo, o.lo), math.min(hi, o.hi))

  def clampPoint(p: Double): Double = math.max(lo, math.min(hi, p))

  /** Directed Hausdorff distance to another interval
    * (/root/reference/r1/interval.go:170-178).
    */
  def directedHausdorffDistance(o: R1Interval): Double = {
    if (isEmpty) return 0
    if (o.isEmpty) return Double.PositiveInfinity
    math.max(0, math.max(hi - o.hi, o.lo - lo))
  }
}

object R1Interval {
  val empty: R1Interval = R1Interval(1, 0)
  def fromPoint(p: Double): R1Interval = R1Interval(p, p)
}

/** Closed circular interval on the unit circle, endpoints in [-Pi, Pi];
  * Lo > Hi means the interval is inverted (wraps through Pi)
  * (/root/reference/s1/interval.go:20-360). Full = [-Pi,Pi], Empty = [Pi,-Pi].
  */
final case class S1Interval(lo: Double, hi: Double) {
  import S1Interval._

  def isFull: Boolean = lo == -math.Pi && hi == math.Pi
  def isEmpty: Boolean = lo == math.Pi && hi == -math.Pi
  def isInverted: Boolean = lo > hi
  def invert: S1Interval = S1Interval(hi, lo)

  def center: Double = {
    val c = 0.5 * (lo + hi)
    if (!isInverted) c
    else if (c <= 0) c + math.Pi
    else c - math.Pi
  }

  def length: Double = {
    var l = hi - lo
    if (l >= 0) l
    else {
      l += 2 * math.Pi
      if (l > 0) l else -1
    }
  }

  private[core] def fastContains(p: Double): Boolean =
    if (isInverted) (p >= lo || p <= hi) && !isEmpty
    else p >= lo && p <= hi

  def contains(p0: Double): Boolean = {
    val p = if (p0 == -math.Pi) math.Pi else p0
    fastContains(p)
  }

  def interiorContains(p0: Double): Boolean = {
    val p = if (p0 == -math.Pi) math.Pi else p0
    if (isInverted) p > lo || p < hi
    else (p > lo && p < hi) || isFull
  }

  def containsInterval(o: S1Interval): Boolean =
    if (isInverted) {
      if (o.isInverted) o.lo >= lo && o.hi <= hi
      else (o.lo >= lo || o.hi <= hi) && !isEmpty
    } else if (o.isInverted) isFull || o.isEmpty
    else o.lo >= lo && o.hi <= hi

  def interiorContainsInterval(o: S1Interval): Boolean =
    if (isInverted) {
      if (o.isInverted) (o.lo > lo && o.hi < hi) || o.isEmpty
      else o.lo > lo || o.hi < hi
    } else if (o.isInverted) isFull || o.isEmpty
    else (o.lo > lo && o.hi < hi) || isFull

  def intersects(o: S1Interval): Boolean =
    if (isEmpty || o.isEmpty) false
    else if (isInverted) o.isInverted || o.lo <= hi || o.hi >= lo
    else if (o.isInverted) o.lo <= hi || o.hi >= lo
    else o.lo <= hi && o.hi >= lo

  def interiorIntersects(o: S1Interval): Boolean =
    if (isEmpty || o.isEmpty || lo == hi) false
    else if (isInverted) o.isInverted || o.lo < hi || o.hi > lo
    else if (o.isInverted) o.lo < hi || o.hi > lo
    else (o.lo < hi && o.hi > lo) || isFull

  def union(o: S1Interval): S1Interval = {
    if (o.isEmpty) this
    else if (fastContains(o.lo)) {
      if (fastContains(o.hi)) {
        if (containsInterval(o)) this else full
      } else S1Interval(lo, o.hi)
    } else if (fastContains(o.hi)) S1Interval(o.lo, hi)
    else if (isEmpty || o.fastContains(lo)) o
    else if (positiveDistance(o.hi, lo) < positiveDistance(hi, o.lo))
      S1Interval(o.lo, hi)
    else S1Interval(lo, o.hi)
  }

  def intersection(o: S1Interval): S1Interval = {
    if (o.isEmpty) empty
    else if (fastContains(o.lo)) {
      if (fastContains(o.hi)) { if (o.length < length) o else this }
      else S1Interval(o.lo, hi)
    } else if (fastContains(o.hi)) S1Interval(lo, o.hi)
    else if (o.fastContains(lo)) this
    else empty
  }

  def addPoint(p0: Double): S1Interval = {
    if (math.abs(p0) > math.Pi) this
    else {
      val p = if (p0 == -math.Pi) math.Pi else p0
      if (fastContains(p)) this
      else if (isEmpty) S1Interval(p, p)
      else if (positiveDistance(p, lo) < positiveDistance(hi, p)) S1Interval(p, hi)
      else S1Interval(lo, p)
    }
  }

  /** Complement interval; singletons complement to full
    * (/root/reference/s1/interval.go:393-400).
    */
  def complement: S1Interval =
    if (lo == hi) S1Interval.full else S1Interval(hi, lo)

  /** Center of the complement; antipodal point for singletons
    * (s1/interval.go:405-414).
    */
  def complementCenter: Double = {
    if (lo != hi) complement.center
    else if (hi <= 0) hi + math.Pi
    else hi - math.Pi
  }

  /** Directed Hausdorff distance h(this, y) on the circle
    * (s1/interval.go:416-446).
    */
  def directedHausdorffDistance(y: S1Interval): Double = {
    if (y.containsInterval(this)) return 0
    if (y.isEmpty) return math.Pi
    val yCC = y.complementCenter
    if (contains(yCC)) return S1Interval.positiveDistance(y.hi, yCC)
    var hiHi = 0.0
    if (S1Interval.fromEndpoints(y.hi, yCC).contains(hi))
      hiHi = S1Interval.positiveDistance(y.hi, hi)
    var loLo = 0.0
    if (S1Interval.fromEndpoints(yCC, y.lo).contains(lo))
      loLo = S1Interval.positiveDistance(lo, y.lo)
    math.max(hiHi, loLo)
  }

  def expanded(margin: Double): S1Interval = {
    if (margin >= 0) {
      if (isEmpty) return this
      if (length + 2 * margin + 2 * Predicates.MachineEps >= 2 * math.Pi) return full
    } else {
      if (isFull) return this
      if (length + 2 * margin - 2 * Predicates.MachineEps <= 0) return empty
    }
    val r = fromEndpoints(
      math.IEEEremainder(lo - margin, 2 * math.Pi),
      math.IEEEremainder(hi + margin, 2 * math.Pi))
    if (r.lo <= -math.Pi) S1Interval(math.Pi, r.hi) else r
  }
}

object S1Interval {
  val empty: S1Interval = S1Interval(math.Pi, -math.Pi)
  val full: S1Interval = S1Interval(-math.Pi, math.Pi)

  def fromEndpoints(lo0: Double, hi0: Double): S1Interval = {
    var lo = lo0; var hi = hi0
    if (lo0 == -math.Pi && hi0 != math.Pi) lo = math.Pi
    if (hi0 == -math.Pi && lo0 != math.Pi) hi = math.Pi
    S1Interval(lo, hi)
  }

  def fromPointPair(a0: Double, b0: Double): S1Interval = {
    val a = if (a0 == -math.Pi) math.Pi else a0
    val b = if (b0 == -math.Pi) math.Pi else b0
    if (positiveDistance(a, b) <= math.Pi) S1Interval(a, b) else S1Interval(b, a)
  }

  /** Distance from a to b going CCW, in [0, 2*Pi] (interval.go:218-224). */
  def positiveDistance(a: Double, b: Double): Double = {
    val d = b - a
    if (d >= 0) d else (b + math.Pi) - (a - math.Pi)
  }
}
