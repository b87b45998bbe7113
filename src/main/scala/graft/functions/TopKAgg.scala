package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-k as a typed [[Aggregator]] — the UDAF point on
  * the reference's §2.11 extension surface
  * (`/root/reference/icecube/bin/sar_cube/datacube.py` exposes hook
  * points for user reductions; Spark's typed Aggregator is the
  * idiomatic equivalent), and the SCALABLE shape for grouped top-k.
  *
  * Why not a window? `row_number() OVER (PARTITION BY g ORDER BY v) <=
  * k` must shuffle EVERY row of every group to one task and sort it
  * there: a group with 10^9 rows sorts 10^9 rows to surface 3. An
  * Aggregator participates in partial aggregation: each map task
  * reduces its slice to ≤ k rows per group *before* the exchange
  * (`reduce` keeps a bounded ordered buffer, `merge` merges two such
  * buffers), so the shuffle carries ≤ k rows per group per map task and
  * no full sort ever happens — the same reason `TakeOrderedAndProject`
  * beats sort-then-limit globally, applied per group. (Spark's own
  * `InferWindowGroupLimit` can push a rank limit into the sort, but the
  * per-group sort and full-row shuffle remain; the Aggregator removes
  * both.)
  *
  * Ordering is total (value DESC, then id ASC) so the result is unique
  * and oracle-comparable; ties can never make the buffer
  * nondeterministic. The buffer is an ordered `List` capped at k:
  * insertion is O(k) per row with k small and constant — the classic
  * bounded sorted-insert (a heap saves nothing at k ≤ 16 and costs
  * encoder complexity).
  */
final case class ScoredId(id: Long, v: Double)

class TopKAgg(k: Int) extends Aggregator[ScoredId, List[ScoredId], List[ScoredId]] {

  /** `a` strictly before `b`: larger value first, smaller id breaks
    * ties. Total over the registry's inputs (no NaN reaches it). */
  private def before(a: ScoredId, b: ScoredId): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], x: ScoredId): List[ScoredId] = {
    def ins(rest: List[ScoredId]): List[ScoredId] = rest match {
      case Nil => x :: Nil
      case h :: t => if (before(x, h)) x :: rest else h :: ins(t)
    }
    ins(buf).take(k)
  }

  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] = {
    def go(x: List[ScoredId], y: List[ScoredId], room: Int): List[ScoredId] =
      if (room == 0) Nil
      else (x, y) match {
        case (Nil, Nil) => Nil
        case (hx :: tx, Nil) => hx :: go(tx, Nil, room - 1)
        case (Nil, hy :: ty) => hy :: go(Nil, ty, room - 1)
        case (hx :: tx, hy :: ty) =>
          if (before(hx, hy)) hx :: go(tx, y, room - 1)
          else hy :: go(x, ty, room - 1)
      }
    go(a, b, k)
  }

  override def finish(buf: List[ScoredId]): List[ScoredId] = buf

  override def bufferEncoder: Encoder[List[ScoredId]] =
    ExpressionEncoder[List[ScoredId]]()
  override def outputEncoder: Encoder[List[ScoredId]] =
    ExpressionEncoder[List[ScoredId]]()
}
