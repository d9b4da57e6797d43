package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import graft.ops.SpatialJoin.CoveringIndex

/** Covering-probe kernel shared by interpreted eval and generated code:
  * leaf-encode the point, probe the broadcast CoveringIndex through the
  * ancestor-chain hash, refine boundary candidates exactly. Returns the
  * matching region ids.
  */
object CoveringProbe {
  type State = (CoveringIndex, (Long, Double, Double) => Boolean)

  def probe(bc: Broadcast[State], lat: Double, lng: Double): Array[Long] = {
    val (idx, refine) = bc.value
    val leaf = graft.core.CellId.fromLatLngDegrees(lat, lng)
    val cands = idx.candidates(leaf)
    if (cands.length == 0) return CoveringProbe.empty
    var out: Array[Long] = null
    var n = 0
    var i = 0
    while (i < cands.length) {
      val rid = cands(i) >> 1
      val interior = (cands(i) & 1L) == 1L
      var dup = false
      var k = 0
      while (k < n) { if (out(k) == rid) { dup = true; k = n } else k += 1 }
      if (!dup && (interior || refine(rid, lat, lng))) {
        if (out == null) out = new Array[Long](cands.length)
        out(n) = rid
        n += 1
      }
      i += 1
    }
    if (n == 0) empty
    else if (n == out.length) out
    else java.util.Arrays.copyOf(out, n)
  }

  private val empty = Array.empty[Long]
}

/** covering_probe(lat, lng) -> array of region ids containing the point.
  *
  * Replaces the boxed ScalaUDF on the headline join's hottest path: a
  * native expression whose doGenCode emits one static call, so the probe
  * stays inside whole-stage codegen with primitive doubles in and a
  * single array allocation out (VERDICT r1 finding #3). The broadcast
  * handle rides along via the codegen reference array, so executors
  * resolve the index through normal broadcast machinery.
  */
case class CoveringProbeExpr(left: Expression, right: Expression,
                             bc: Broadcast[CoveringProbe.State])
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(lat: Any, lng: Any): Any =
    new GenericArrayData(CoveringProbe.probe(bc,
      lat.asInstanceOf[Double], lng.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("coveringProbeBc", bc,
      classOf[Broadcast[CoveringProbe.State]].getName)
    defineCodeGen(ctx, ev, (lat, lng) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CoveringProbe.probe($bcRef, $lat, $lng))")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "covering_probe"
}
