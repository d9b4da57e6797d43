package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score desc, id asc) entries, kept in
  * rank order. Insertion is a linear shift (k is small — a per-domain cap,
  * not a result page), so update is O(k) worst case and the buffer never
  * exceeds k entries regardless of group size.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** (s1, i1) ranks strictly before (s2, i2)? NaN scores rank last. */
  @inline private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val a = if (s1.isNaN) Double.NegativeInfinity else s1
    val b = if (s2.isNaN) Double.NegativeInfinity else s2
    a > b || (a == b && i1 < i2)
  }

  def insert(score: Double, id: Long): Unit = {
    if (n == k && !before(score, id, scores(n - 1), ids(n - 1))) return
    var pos = n
    while (pos > 0 && before(score, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    val last = math.min(n, k - 1)
    var j = last
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    if (pos < k) { scores(pos) = score; ids(pos) = id }
    if (n < k) n += 1
  }
}

/** top_k_ids(score, id, k): aggregate returning the ids of the k best
  * (score desc, id asc) rows of the group, in rank order.
  *
  * This is the scale-correct per-key cap: a window row_number() <= k sorts
  * every stratum's full row set on one reducer (a hot domain = one giant
  * sort), while this aggregate carries O(k) state through map-side partial
  * aggregation — a boilerplate domain with 10^8 pages costs each task k
  * slots and the merge tree, never a sort.
  */
case class TopKByScore(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer]
    with ImplicitCastInputTypes with BinaryLike[Expression] {
  require(k > 0, "top_k_ids needs k > 0")

  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.ids, buf.n))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    // entries arrive already rank-ordered, so inserts are appends
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKByScore =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKByScore =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "top_k_ids"
}

object TopKByScore {
  /** Column API: ids of the k best (score desc, id asc) rows per group. */
  def topKIds(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())
}

/** Bounded top-k buffer with string payloads and integer scores, ordered
  * (score desc, str asc BYTEWISE). The bytewise tie-break (UTF8String's
  * binary compare) matches DuckDB's default binary collation exactly, so
  * a SQL oracle can reproduce the order on any input, not just ASCII —
  * java.lang.String.compareTo (UTF-16 code units) would diverge on
  * supplementary-plane text.
  */
final class TopKStrBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  val scores = new Array[Long](k)
  val strs = new Array[UTF8String](k)
  var n = 0

  @inline private def before(s1: Long, t1: UTF8String,
                             s2: Long, t2: UTF8String): Boolean =
    s1 > s2 || (s1 == s2 && t1.compareTo(t2) < 0)

  /** Would (score, str) enter the buffer? Callers use this to skip the
    * defensive UTF8String clone for the common reject path.
    */
  def accepts(score: Long, str: UTF8String): Boolean =
    n < k || before(score, str, scores(n - 1), strs(n - 1))

  /** Insert a str the caller owns (already cloned off any reused row). */
  def insert(score: Long, str: UTF8String): Unit = {
    if (!accepts(score, str)) return
    var pos = n
    while (pos > 0 && before(score, str, scores(pos - 1), strs(pos - 1))) pos -= 1
    var j = math.min(n, k - 1)
    while (j > pos) { scores(j) = scores(j - 1); strs(j) = strs(j - 1); j -= 1 }
    if (pos < k) { scores(pos) = score; strs(pos) = str }
    if (n < k) n += 1
  }
}

/** top_k_strs(score, str, k): the k best (score desc, str asc bytewise)
  * (score, string) pairs of the group as an array of structs, in rank
  * order. Same scale contract as top_k_ids: O(k) state through map-side
  * partial aggregation — the per-language vocabulary head over a
  * 10^11-token 'en' stratum costs each task k slots, never a sort.
  */
case class TopKStrings(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKStrBuffer]
    with ImplicitCastInputTypes with BinaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String
  require(k > 0, "top_k_strs needs k > 0")

  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("str", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = left.eval(input)
    val t = right.eval(input)
    if (s != null && t != null) {
      val score = s.asInstanceOf[Long]
      val str = t.asInstanceOf[UTF8String]
      // clone only when the entry will land: the buffer outlives the
      // (reused) input row, but rejects are the common case
      if (buf.accepts(score, str)) buf.insert(score, str.clone())
    }
    buf
  }

  override def merge(buf: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.scores(i), other.strs(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKStrBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.scores(i), buf.strs(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    var size = 4
    var i = 0
    while (i < buf.n) { size += 12 + buf.strs(i).numBytes(); i += 1 }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buf.n)
    i = 0
    while (i < buf.n) {
      bb.putLong(buf.scores(i))
      val bytes = buf.strs(i).getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKStrBuffer(k)
    var i = 0
    while (i < n) {
      val score = bb.getLong
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.insert(score, UTF8String.fromBytes(arr))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKStrings =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKStrings =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "top_k_strs"
}

object TopKStrings {
  /** Column API: the k best (score desc, str asc bytewise) pairs per
    * group as structs (score, str), rank-ordered.
    */
  def topKStrs(score: Column, str: Column, k: Int): Column =
    ColumnBridge.column(TopKStrings(
      ColumnBridge.expression(score),
      ColumnBridge.expression(str), k).toAggregateExpression())
}
