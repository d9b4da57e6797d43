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

/** shingles(text) -> sorted distinct word n-gram FNV hashes. */
case class ShingleHashesExpr(child: Expression, shingleSize: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    new GenericArrayData(graft.ops.Dedup.shingleHashes(
      s.asInstanceOf[UTF8String].toString, shingleSize))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.ops.Dedup.shingleHashes($a.toString(), $shingleSize))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

object JaccardStatics {
  /** Exact Jaccard of two SORTED distinct long arrays (merge intersect;
    * same values as Dedup.ngramJaccard given its sorted shingle sets).
    */
  def sortedJaccard(a: org.apache.spark.sql.catalyst.util.ArrayData,
                    b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }
}

/** jaccard_sorted(a, b) -> exact Jaccard of two sorted long-hash sets. */
case class SortedJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardStatics.sortedJaccard(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardStatics.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted"
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

/** Codegen-reachable hyperplane-LSH helpers: plane tables cached per
  * (nBits, dim, seed).
  */
object LshStatics {
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Long), Array[Array[Double]]]()
  def planes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((nBits, dim, seed),
      _ => graft.ops.Similarity.hyperplanes(nBits, dim, seed))

  def signature(vec: org.apache.spark.sql.catalyst.util.ArrayData,
                nBits: Int, dim: Int, seed: Long): Long = {
    val ps = planes(nBits, dim, seed)
    var sig = 0L
    var b = 0
    while (b < ps.length) {
      val p = ps(b)
      var dot = 0.0
      var i = 0
      val n = math.min(p.length, vec.numElements())
      while (i < n) { dot += p(i) * vec.getFloat(i); i += 1 }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** FNV-1a over a signature slice, matching Dedup.minHashLsh's band key. */
  def bandKey(sig: org.apache.spark.sql.catalyst.util.ArrayData,
              band: Int, rowsPerBand: Int): Long = {
    var h = 0xcbf29ce484222325L ^ band.toLong
    var i = band * rowsPerBand
    while (i < (band + 1) * rowsPerBand) {
      h ^= sig.getLong(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** lsh_sig(vec) -> packed hyperplane sign signature (parameters are
  * expression constants; float input arrays).
  */
case class HyperplaneSigExpr(child: Expression, nBits: Int, dim: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    LshStatics.signature(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      nBits, dim, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.LshStatics.signature($a, $nBits, $dim, ${seed}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "lsh_sig"
}

/** band_key(sig, band) -> FNV-1a of the band's signature slice. */
case class BandKeyExpr(left: Expression, right: Expression, rowsPerBand: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(sig: Any, band: Any): Any =
    LshStatics.bandKey(
      sig.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      band.asInstanceOf[Int], rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.LshStatics.bandKey($a, $b, $rowsPerBand)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "band_key"
}

object BenchOverlapStatics {
  /** Count of sorted-array elements present in the sorted broadcast set
    * (both ascending signed; one merge pass, no allocation).
    */
  def overlapCount(a: org.apache.spark.sql.catalyst.util.ArrayData,
                   bench: Array[Long]): Long = {
    var i = 0; var j = 0; var hits = 0L
    val n = a.numElements()
    while (i < n && j < bench.length) {
      val x = a.getLong(i)
      if (x == bench(j)) { hits += 1; i += 1; j += 1 }
      else if (x < bench(j)) i += 1
      else j += 1
    }
    hits
  }
}

/** bench_overlap(shingles) -> how many of the row's sorted distinct
  * shingle hashes appear in the broadcast benchmark gram set. The
  * benchmark set rides the codegen reference array as a broadcast
  * (CoveringProbeExpr's pattern), so the corpus pass is a shuffle-free
  * map stage at any corpus size.
  */
case class BenchOverlapExpr(child: Expression,
                            bc: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    BenchOverlapStatics.overlapCount(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bc.value)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("benchGramsBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[Array[Long]]].getName)
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.BenchOverlapStatics.overlapCount($a, " +
        s"(long[]) $bcRef.value())")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "bench_overlap"
}

object TextNormStatics {
  /** Unicode NFC normalization with an ASCII fast path: web text is
    * overwhelmingly pure-ASCII per row, and ASCII is NFC by definition,
    * so the byte scan short-circuits the Normalizer (and its String
    * round trip) for the common case. Non-ASCII rows normalize via
    * java.text.Normalizer (UAX #15 — the same algorithm DuckDB's
    * utf8proc implements, so the SQL twin `nfc_normalize` is exact).
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n && (s.getByte(i) & 0x80) == 0) i += 1
    if (i == n) return s
    val str = s.toString
    val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    if (norm == str) s else UTF8String.fromString(norm)
  }
}

/** nfc_normalize(text) -> Unicode NFC form. A codegen'd static call —
  * the normalization pass before any hashing/dedup stage, so visually
  * identical composed/decomposed variants hash identically.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextNormStatics.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextNormStatics.nfc($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

object TextHash {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)
  def benchOverlap(shingles: Column,
                   bc: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    col(BenchOverlapExpr(expr(shingles), bc))
  def simHash64(text: Column): Column = col(SimHash64Expr(expr(text)))
  def minHashSig(text: Column, shingleSize: Int, numHashes: Int,
                 seed: Long): Column =
    col(MinHashSigExpr(expr(text), shingleSize, numHashes, seed))
  def hyperplaneSig(vec: Column, nBits: Int, dim: Int, seed: Long): Column =
    col(HyperplaneSigExpr(expr(vec), nBits, dim, seed))
  def bandKey(sig: Column, band: Column, rowsPerBand: Int): Column =
    col(BandKeyExpr(expr(sig), expr(band), rowsPerBand))
  def shingleHashes(text: Column, shingleSize: Int): Column =
    col(ShingleHashesExpr(expr(text), shingleSize))
  def sortedJaccard(a: Column, b: Column): Column =
    col(SortedJaccardExpr(expr(a), expr(b)))
  def nfcNormalize(text: Column): Column = col(NfcNormalizeExpr(expr(text)))
}
