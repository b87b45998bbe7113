package graft.operators

import graft.QueryDef
import graft.util.Tables._
import org.apache.spark.sql.functions._

/** Distribution-shape audits: per-source drift against the corpus and
  * per-key skew on the event stream.
  *
  * Both are the observability half of the scale posture: drift tells a
  * mixture/curation run that a source's length profile has wandered from
  * the corpus (the trigger for re-weighting); skew is the number every
  * shuffle-sizing decision (salting, AQE skew-join thresholds) actually
  * depends on — measured, not guessed.
  *
  * All emissions are exact integers (floor-division ppm over BIGINT
  * counts), so both engines hash-match bit-for-bit.
  */
object DriftQueries {

  def defs: Map[String, QueryDef] = Map(

    // ----- per-source token-length drift vs the corpus profile -----
    // Total-variation distance between each source's log2-bucketed
    // token-length distribution and the corpus-wide one, in ppm
    // (tv2_ppm = Σ|p_s − p| ≈ 2·TV). Buckets are length(bin(n)) — the
    // same pure-integer log2 tokens_histogram uses; probabilities are
    // floor-division ppm, so the whole statistic is integer-exact.
    // Scale shape: ONE map-side-combinable aggregate over a stateless
    // projection produces the (source × bucket) table; everything after
    // is taxonomy×~40-bucket bounded (the localCheckpoint'ed occupancy
    // grid), never corpus-cardinality.
    "source_length_drift" -> QueryDef.sql(
      """WITH b AS (
        |  SELECT source,
        |    CAST(length(bin(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT))) AS BIGINT) AS bucket
        |  FROM documents),
        |o AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS o FROM b GROUP BY 1, 2),
        |r AS (SELECT source, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
        |cb AS (SELECT bucket, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |d AS (
        |  SELECT g.source, g.r,
        |    abs((1000000 * COALESCE(o.o, 0)) // g.r - (1000000 * g.c) // g.n) AS dv
        |  FROM (SELECT r.source, r.r, cb.bucket, cb.c, tot.n
        |        FROM r CROSS JOIN cb CROSS JOIN tot) g
        |  LEFT JOIN o ON o.source = g.source AND o.bucket = g.bucket)
        |SELECT source, min(r) AS n_docs, CAST(sum(dv) AS BIGINT) AS tv2_ppm
        |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val o = documents(s, d)
        .select(col("source"),
          length(bin(size(expr(TextQueries.toksExpr)).cast("long"))).cast("long").as("bucket"))
        .groupBy("source", "bucket").agg(count(lit(1)).as("o"))
        .localCheckpoint(true) // taxonomy × ~40 buckets
      val r = o.groupBy("source").agg(sum("o").as("r"))
      val c = o.groupBy("bucket").agg(sum("o").as("c"))
      val tot = o.agg(sum("o").as("n"))
      r.crossJoin(c).crossJoin(broadcast(tot))
        .join(o, Seq("source", "bucket"), "left")
        .select(col("source"), col("r"),
          abs(expr("(1000000 * coalesce(o, 0L)) div r")
            - expr("(1000000 * c) div n")).as("dv"))
        .groupBy("source")
        .agg(min("r").as("n_docs"), sum("dv").as("tv2_ppm"))
        .orderBy("source")
    },

    // ----- per-event-type key skew: the salting/AQE decision input -----
    // For each event type: how concentrated is the per-user key
    // distribution that every user-keyed shuffle (sessionize, funnel,
    // transitions) hashes on? top_share_ppm is the hottest key's share;
    // skew_x1e6 is max/mean (1e6 = perfectly uniform) — the multiplier
    // a skew-aware planner compares against its split threshold. ONE
    // user-keyed map-side-combinable aggregate, then a taxonomy-bounded
    // rollup; all-integer emissions.
    "key_skew_report" -> QueryDef.sql(
      """WITH uc AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(max(n) AS BIGINT) AS max_user_events,
        |  (1000000 * max(n)) // sum(n) AS top_share_ppm,
        |  (1000000 * max(n) * count(*)) // sum(n) AS skew_x1e6
        |FROM uc GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(sum("n").as("total"), count(lit(1)).as("n_users"),
          max("n").as("max_user_events"))
        .select(col("event_type"), col("total"), col("n_users"), col("max_user_events"),
          expr("(1000000 * max_user_events) div total").as("top_share_ppm"),
          expr("(1000000 * max_user_events * n_users) div total").as("skew_x1e6"))
        .orderBy("event_type")
    },
  )
}
