package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash kernels for the dedup pipeline: the 64-bit SimHash
  * and the seeded MinHash signature as Catalyst expressions (straight
  * calls into graft.ops.Dedup's scalar kernels, so values are identical
  * to the former UDFs bit-for-bit), evaluated inside whole-stage codegen
  * without per-row closure boxing.
  */
object TextHashStatics {
  def simHash(s: UTF8String): Long = graft.ops.Dedup.simHash(s.toString)

  // Permutation tables are deterministic functions of (numHashes, seed);
  // cache per parameter pair for the JVM lifetime (a few KB each).
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[(Long, Long)]]()
  def perms(numHashes: Int, seed: Long): Array[(Long, Long)] =
    permCache.computeIfAbsent((numHashes, seed),
      _ => graft.ops.Dedup.permsFor(numHashes, seed))

  def minHashSig(s: UTF8String, shingleSize: Int, numHashes: Int,
                 seed: Long): Array[Long] =
    graft.ops.Dedup.minHashSignature(
      graft.ops.Dedup.shingleHashes(s.toString, shingleSize),
      perms(numHashes, seed))
}

/** simhash64(text) -> 64-bit SimHash over whitespace tokens. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    TextHashStatics.simHash(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashStatics.simHash($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** minhash_sig(text) -> numHashes-element MinHash signature with the
  * given shingle size and seed (parameters are expression constants).
  */
case class MinHashSigExpr(child: Expression, shingleSize: Int,
                          numHashes: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    new GenericArrayData(TextHashStatics.minHashSig(
      s.asInstanceOf[UTF8String], shingleSize, numHashes, seed))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHashStatics.minHashSig($a, $shingleSize, ${numHashes}, ${seed}L))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object TextHash {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)
  def simHash64(text: Column): Column = col(SimHash64Expr(expr(text)))
  def minHashSig(text: Column, shingleSize: Int, numHashes: Int,
                 seed: Long): Column =
    col(MinHashSigExpr(expr(text), shingleSize, numHashes, seed))
}
