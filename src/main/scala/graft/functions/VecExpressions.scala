package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** Native vector kernels over embedding columns.
  *
  * Semantics are EXACTLY the sequential-double accumulation of
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, +)` —
  * same values bit-for-bit, so results stay comparable against the
  * DuckDB oracles — but without materializing a products array per row:
  * one fused loop over the two ArrayData columns, inside whole-stage
  * codegen.
  */
private object VecExprUtil {
  def getter(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }
  def elemAt(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case ArrayType(FloatType, _) => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }
}

/** vec_dot(a, b) -> sum_i double(a_i) * double(b_i), sequential order. */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs float/double arrays, got ${left.dataType}, ${right.dataType}")
  }
  // A null ELEMENT null-propagates the whole result, exactly like the
  // aggregate(zip_with(...)) SQL form this expression claims parity with
  // (a null product poisons the + fold). ArrayData.getDouble on a null
  // slot returns an unspecified value, so the slots must be checked.
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += VecExprUtil.elemAt(x, left.dataType, i) *
        VecExprUtil.elemAt(y, right.dataType, i)
      i += 1
    }
    sum
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ga = VecExprUtil.getter(left.dataType)
    val gb = VecExprUtil.getter(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  ${ev.value} += (double) $a.$ga($i) * (double) $b.$gb($i);
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** vec_norm2(a) -> sum_i double(a_i)^2, sequential order. */
case class VecNorm2Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_norm2 needs a float/double array, got $dt")
  }
  // Null elements null-propagate (see VecDotExpr).
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val x = a.asInstanceOf[ArrayData]
    var sum = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null
      val v = VecExprUtil.elemAt(x, child.dataType, i)
      sum += v * v
      i += 1
    }
    sum
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = VecExprUtil.getter(child.dataType)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = (double) $a.$g($i);
         |  ${ev.value} += $v * $v;
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_norm2"
}

object VecIntStatics {
  /** Exact integer dot of two int-code arrays (SQ8 path): products and
    * the sum in Long — no rounding anywhere, so the value is identical
    * in any engine and at any summation order. Overflow headroom: dims
    * up to 2^31 x |code| <= 128 stays under 2^45.
    */
  def dotInt(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    sum
  }
}

/** vec_dot_i8(a, b) -> exact BIGINT dot of two int-code arrays. */
case class VecDotIntExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecIntStatics.dotInt(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecIntStatics.dotInt($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot_i8"
}

object Vec {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)
  def dot(a: Column, b: Column): Column = col(VecDotExpr(expr(a), expr(b)))
  def norm2(a: Column): Column = col(VecNorm2Expr(expr(a)))
  def dotInt(a: Column, b: Column): Column =
    col(VecDotIntExpr(expr(a), expr(b)))
}
