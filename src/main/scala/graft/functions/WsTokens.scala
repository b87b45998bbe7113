package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `ws_tokens(text)` ≡ `split(trim(lower(text)), '\\s+')` — the
  * corpus-wide tokenizer, as one native codegen expression.
  *
  * Why: Spark's `StringSplit` with a regex pattern routes through
  * `Pattern.split(this.toString(), -1)` — a full UTF-16 decode of the
  * document, a regex matcher walk, one `String` per token, and one
  * re-encode back to UTF8String per token, per row, per query. The
  * token family (text/bm25/bpe/unigram/nb/curation) runs this over the
  * whole corpus dozens of times per bench pass; the regex is fixed at
  * `\s+`, whose match set is exactly the six ASCII bytes
  * {9,10,11,12,13,32} (Java `\s` without UNICODE_CHARACTER_CLASS), so
  * a single byte scan produces the identical token array with zero
  * regex machinery and zero per-token re-encoding (tokens are no-copy
  * views into one private lowered buffer).
  *
  * Exact-equivalence contract (WsTokensSpec property-checks against the
  * composed builtin):
  *   - `lower` / `trim` are the UTF8String fast paths Spark itself uses
  *     (trim strips 0x20 only — NOT other whitespace, so a tab-leading
  *     string still yields Java split's leading "" element);
  *   - empty input → [""], like `Pattern.split("")`;
  *   - leading whitespace → leading "" element; trailing whitespace →
  *     trailing "" element (Spark passes limit = -1);
  *   - multi-byte UTF-8 passes through untouched (every non-ASCII byte
  *     is ≥ 0x80 and never matches the whitespace set).
  * Null text → null (UnaryExpression default). Element type is
  * `ArrayType(StringType, containsNull = false)` to match Spark 4.1's
  * `StringSplit` (elements are never null); declaring true injected a
  * spurious `isnotnull(word)` filter after every downstream explode.
  */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"ws_tokens expects string, got $dt")
  }

  override def nullSafeEval(t: Any): Any =
    WsTokens.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.WsTokens.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsTokens {

  private def isWs(b: Byte): Boolean =
    b == 32 || (b >= 9 && b <= 13)

  def compute(text: UTF8String): ArrayData = {
    // One private buffer per row: getBytes copies out of the (possibly
    // shared/reused) row buffer, so the no-copy token views below stay
    // valid after this row is consumed.
    val t = text.toLowerCase.trim()
    val bytes = t.getBytes
    val nb = bytes.length
    if (nb == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    // pass 1: count segments (tokens incl. leading/trailing empties)
    var n = 1
    var i = 0
    var inWs = false
    while (i < nb) {
      val w = isWs(bytes(i))
      if (w && !inWs) n += 1
      inWs = w
      i += 1
    }
    val out = new Array[Any](n)
    var seg = 0
    var segStart = 0
    i = 0
    while (i < nb) {
      if (isWs(bytes(i))) {
        out(seg) = UTF8String.fromBytes(bytes, segStart, i - segStart)
        seg += 1
        i += 1
        while (i < nb && isWs(bytes(i))) i += 1
        segStart = i
      } else i += 1
    }
    out(seg) = UTF8String.fromBytes(bytes, segStart, nb - segStart)
    new GenericArrayData(out)
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def ws_tokens(text: Column): Column = call_function("ws_tokens", text)
}

/** `ws_token_count(text)` ≡ `size(split(trim(lower(text)), '\\s+'))` —
  * the token COUNT without materializing the token array (the gopher /
  * length-stats family only ever takes the size). Same segment
  * semantics as [[WsTokens]] (leading/trailing empties count); lower
  * is skipped entirely — case never changes whitespace structure, so
  * the count over the trimmed raw bytes is identical. Null → null
  * (`size` on a null array is -1 under legacy conf but every call site
  * filters nulls first; parity pinned in WsTokensSpec). */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"ws_token_count expects string, got $dt")
  }

  override def nullSafeEval(t: Any): Any =
    WsTokenCount.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.WsTokenCount.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsTokenCount {

  def compute(text: UTF8String): Int = {
    val t = text.trim() // lower() can't change whitespace — skip it
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val nb = t.numBytes
    if (nb == 0) return 1 // Pattern.split("") → [""]
    var n = 1
    var i = 0
    var inWs = false
    while (i < nb) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      val w = b == 32 || (b >= 9 && b <= 13)
      if (w && !inWs) n += 1
      inWs = w
      i += 1
    }
    n
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def ws_token_count(text: Column): Column = call_function("ws_token_count", text)
}
