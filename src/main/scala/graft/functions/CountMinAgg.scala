package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `count_min_agg(token, weight)` — the 4×1024 count-min fold as a
  * native [[TypedImperativeAggregate]]: one 4096-cell Long buffer per
  * group, merged by element-wise ADDITION.
  *
  * The second sketch to get the native-aggregate treatment (the first
  * is [[HllRegistersAgg]]), and the one where the treatment is
  * EXACTNESS-free-of-charge: count-min cells are sums, so the merge is
  * exact and the fold is split-invariant bit-for-bit — no theorem
  * needed, CountMinAggSpec asserts buffer equality across arbitrary
  * repartitionings. Why it matters at 100 TB: the relational build
  * (`SketchQueries.countMinCells`) shuffles up to depth×width rows per
  * group per map task; this aggregate's partials cross the shuffle as
  * ONE 32 KB row per group per task, which is the shape per-(source,
  * day) sketch maintenance wants when strata are many. It also removes
  * the vocabulary fold from the critical path: feeding RAW tokens with
  * weight 1 is a single corpus pass with map-side combine.
  *
  * Hash contract: cell (j, slot) for token t uses slot =
  * md5(j || '#' || t) first-15-hex-chars mod 1024 — byte-identical to
  * [[graft.operators.SketchQueries.cmSlotOf]] and to the DuckDB
  * oracle's `('0x' || substr(md5(...), 1, 15))::BIGINT % 1024`, so the
  * native fold hash-matches the relational cells row-for-row
  * (`count_min_native`'s gate). Null tokens and null weights are
  * skipped.
  *
  * Output: the 4096-cell array (j-major: cell i is depth i÷1024, slot
  * i mod 1024); zero cells are real zeros the consumer filters.
  */
case class CountMinAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private val Depth = 4
  private val Width = 1024
  private val N = Depth * Width

  @transient private lazy val md5k = new Md5Kernel
  // reusable "<digit>#<token-utf8>" scratch — the former per-token
  // j.toString + "#" + tok String/byte[] allocations (×4 depths) were
  // most of this aggregate's CPU; the bytes hashed are identical.
  @transient private var scratch: Array[Byte] = _

  override def createAggregationBuffer(): Array[Long] = new Array[Long](N)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val t = left.eval(input)
    val w = right.eval(input)
    if (t != null && w != null) {
      val tok = t.asInstanceOf[UTF8String]
      val cnt = w.asInstanceOf[Long]
      val tb = tok.numBytes
      if (scratch == null || scratch.length < tb + 2)
        scratch = new Array[Byte](math.max(tb + 2, 64))
      tok.writeToMemory(scratch,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 2)
      scratch(1) = '#'
      var j = 0
      while (j < Depth) {
        scratch(0) = ('0' + j).toByte
        md5k.digest(scratch, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, tb + 2)
        // first 15 hex chars = the top 60 bits of the big-endian head
        val h = md5k.hi >>> 4
        buf(j * Width + (h % Width).toInt) += cnt
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < N) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(N * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](N)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_min_agg expects (STRING token, BIGINT weight), got " +
          s"(${left.dataType}, ${right.dataType})")

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "count_min_agg"
}
