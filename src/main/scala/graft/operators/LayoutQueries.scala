package graft.operators

import graft.QueryDef
import graft.util.Tables._
import org.apache.spark.sql.functions._

/** Storage-layout optimization: Z-order (Morton) clustering of the
  * event stream on (time, user) — the multi-dimensional generalization
  * of the band-partitioned / bucketed layouts the cube store already
  * uses, and the layout trick behind Delta/Iceberg `ZORDER BY`.
  *
  * A single-column sort prunes scans on ONE predicate dimension; bit
  * interleaving the two bucket coordinates puts rows close in (t, u)
  * space close in file order, so min/max file statistics prune scans on
  * EITHER dimension. The query emits, per Z-bucket, exactly those
  * file-level statistics (count + min/max of both coordinates) — the
  * artifact a writer would hand to `repartitionByRange(z)` and a reader
  * would prune with. All-integer (bucket, shift, mask) arithmetic,
  * hash-exact on both engines.
  */
object LayoutQueries {

  private val Bits = 4 // 16×16 grid → 256 Z-buckets

  private def zSpark: String =
    (0 until Bits).map(i =>
      s"shiftleft(shiftright(x, $i) & 1, ${2 * i}) + shiftleft(shiftright(y, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")

  private def zDuck: String =
    (0 until Bits).map(i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  def defs: Map[String, QueryDef] = Map(

    // ----- length-curriculum training order -----
    // The Shortformer-style sequence-length curriculum: training reads
    // documents in phase order (short sequences first — phases are
    // 64-token-wide length bands, capped at 3) with a deterministic LCG
    // shuffle INSIDE each phase, so early optimization sees cheap short
    // batches while order within a phase stays unbiased. The global
    // position is the two-pass distributed prefix-sum row number
    // (`Scale.globalRowNumber`) — never a single-partition window —
    // over (phase, shuffle key, doc_id); the same infrastructure as
    // shuffle_order, composed with curriculum semantics.
    "curriculum_order" -> QueryDef.sql(
      s"""WITH k AS (
         |  SELECT doc_id,
         |    least(CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) // 64, 3) AS phase,
         |    ${CurationQueries.LcgSql} AS k
         |  FROM documents)
         |SELECT doc_id, phase,
         |  CAST(row_number() OVER (ORDER BY phase, k, doc_id) AS BIGINT) AS position
         |FROM k ORDER BY doc_id""".stripMargin) { (s, d) =>
      val keyed = documents(s, d).select(col("doc_id"),
        least(expr(s"CAST(size(${TextQueries.toksExpr}) AS BIGINT) div 64"), lit(3L)).as("phase"),
        expr(CurationQueries.LcgSql).as("k"))
      val (ranked, _) = graft.util.Scale.globalRowNumber(
        keyed, Seq(col("phase"), col("k"), col("doc_id")), "position")
      ranked.select("doc_id", "phase", "position").orderBy("doc_id")
    },

    // ----- Z-order bucket layout + its pruning statistics -----
    // x = stream hour offset (capped at 15), y = user shard (mod 16);
    // z interleaves their bits. The min/max spans in the output are
    // tight in BOTH dimensions per bucket — the property that makes
    // file skipping work for time-range AND user-equality predicates at
    // once. One stateless projection (the 1-row min-hour aggregate
    // broadcasts) + one 256-bucket aggregate.
    "zorder_layout" -> QueryDef.sql(
      s"""WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hr, user_id FROM events),
         |m AS (SELECT min(hr) AS h0 FROM e),
         |xy AS (SELECT least(hr - m.h0, 15) AS x, ((user_id % 16) + 16) % 16 AS y
         |       FROM e CROSS JOIN m),
         |zb AS (SELECT ($zDuck) AS z, x, y FROM xy)
         |SELECT z, CAST(count(*) AS BIGINT) AS n_events,
         |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
         |FROM zb GROUP BY z ORDER BY z""".stripMargin) { (s, d) =>
      // hour from floored µs + truncating div ≡ the oracle's
      // epoch_us(ts) // 3600000000 for every sign/precision (see
      // event_anomaly_mad); pmod on the Spark side ≡ the oracle's
      // ((user_id % 16) + 16) % 16 for all signs.
      val e = events(s, d).select(
        expr(s"(${graft.util.Tables.epochUsFloorSql}) div 3600000000").as("hr"),
        col("user_id"))
      val m = e.agg(min("hr").as("h0"))
      e.crossJoin(broadcast(m))
        .select(least(col("hr") - col("h0"), lit(15L)).as("x"),
          pmod(col("user_id"), lit(16L)).as("y"))
        .select(expr(zSpark).as("z"), col("x"), col("y"))
        .groupBy("z")
        .agg(count(lit(1)).as("n_events"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .orderBy("z")
    },
  )
}
