package graft.core

/** Cell metrics: map target sizes (radians / steradians) to cell levels.
  * Constants and formulas match /root/reference/s2/metric.go:28-155
  * (quadratic projection values only).
  */
final case class Metric(dim: Int, deriv: Double) {
  /** deriv * 2^(-dim*level) (metric.go:109-111). */
  def value(level: Int): Double = {
    // math.Ldexp(deriv, -dim*level)
    deriv * java.lang.Math.scalb(1.0, -dim * level)
  }

  /** Minimum level such that value(level) <= val (metric.go:120-133). */
  def minLevel(v: Double): Int = {
    if (v < 0) return CellId.MaxLevel
    val l = -(java.lang.Math.getExponent(v / deriv) >> (dim - 1))
    math.max(math.min(l, CellId.MaxLevel), 0)
  }

  /** Maximum level such that value(level) >= val (metric.go:139-147). */
  def maxLevel(v: Double): Int = {
    if (v <= 0) return CellId.MaxLevel
    val l = java.lang.Math.getExponent(deriv / v) >> (dim - 1)
    math.max(math.min(l, CellId.MaxLevel), 0)
  }

  /** Level where the metric is approximately val (metric.go:151-155). */
  def closestLevel(v: Double): Int =
    minLevel((if (dim == 2) 2.0 else math.sqrt(2.0)) * v)
}

object Metric {
  val MinAngleSpan: Metric = Metric(1, 4.0 / 3)
  val AvgAngleSpan: Metric = Metric(1, math.Pi / 2)
  val MaxAngleSpan: Metric = Metric(1, 1.704897179199218452)

  val MinWidth: Metric = Metric(1, 2 * math.sqrt(2.0) / 3)
  val AvgWidth: Metric = Metric(1, 1.434523672886099389)
  val MaxWidth: Metric = Metric(1, MaxAngleSpan.deriv)

  val MinEdge: Metric = Metric(1, 2 * math.sqrt(2.0) / 3)
  val AvgEdge: Metric = Metric(1, 1.459213746386106062)
  val MaxEdge: Metric = Metric(1, MaxAngleSpan.deriv)
  val MaxEdgeAspect: Double = 1.442615274452682920

  val MinArea: Metric = Metric(2, 8 * math.sqrt(2.0) / 9)
  val AvgArea: Metric = Metric(2, 4 * math.Pi / 6)
  val MaxArea: Metric = Metric(2, 2.635799256963161491)

  val MinDiag: Metric = Metric(1, 8 * math.sqrt(2.0) / 9)
  val AvgDiag: Metric = Metric(1, 2.060422738998471683)
  val MaxDiag: Metric = Metric(1, 2.438654594434021032)
  val MaxDiagAspect: Double = math.sqrt(3.0)
}
