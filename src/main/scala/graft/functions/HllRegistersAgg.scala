package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `hll_registers_agg(h)` — the HyperLogLog register fold as a native
  * [[TypedImperativeAggregate]]: 256 six-bit registers in ONE 256-byte
  * buffer per group.
  *
  * Why a custom aggregate when the relational spelling
  * ([[graft.operators.SketchQueries.hllRegisters]]) already works: the
  * relational form keys the aggregate by (stratum, idx), so the
  * exchange carries up to 256 rows per stratum per map task. This
  * aggregate is the shape a 100 TB run wants when strata are MANY
  * (per-(type, day), per-tenant, per-shard): partial aggregation folds
  * each map task's slice into one 256-byte buffer per group, `merge`
  * is a byte-wise MAX, and the shuffle carries exactly ONE row per
  * group per map task — the same bounded-buffer argument as
  * [[TopKAgg]], applied to sketch state. (It is also the idiomatic
  * host for HLL's merge law: byte-wise MAX is the register algebra,
  * executed in place.)
  *
  * Input contract: the 60-bit non-negative hash the family derives as
  * `conv(substr(md5(v), 1, 15), 16, 10)` — idx = h % 256, rank =
  * 53 − bitlen(h ÷ 256) (53 when the upper bits are zero), exactly the
  * [[graft.operators.SketchQueries.hllRegisters]] definition, so the
  * two spellings agree register-for-register (HllAggSpec asserts it).
  * Null inputs are skipped.
  *
  * Output: struct(s BIGINT, n_regs BIGINT) — the 2⁵³-scaled harmonic
  * denominator Σ 2^(53−Mⱼ) (empty registers contribute 2⁵³, so the sum
  * needs no occupancy correction) and the occupied-register count the
  * linear-counting regime switch reads. Downstream arithmetic is the
  * shared integer estimate chain
  * ([[graft.operators.SketchQueries.hllEstExpr]]).
  *
  * Registered on the session by [[graft.GraftExtensions]]; use from
  * SQL as `hll_registers_agg(h)` or via
  * `call_function("hll_registers_agg", col)`.
  */
case class HllRegistersAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val M = 256

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h % M).toInt
      val w = h / M
      val rank = if (w == 0L) 53
        else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L
    var n = 0L
    var i = 0
    while (i < M) {
      s += 1L << (53 - buf(i))
      if (buf(i) != 0) n += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](s, n))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOf(bytes, M)

  override def dataType: DataType = StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("n_regs", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_registers_agg expects a BIGINT hash input, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(offset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): HllRegistersAgg =
    copy(child = newChild)

  override def prettyName: String = "hll_registers_agg"
}
