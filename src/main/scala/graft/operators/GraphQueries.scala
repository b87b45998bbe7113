package graft.operators

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the near-duplicate candidate graph —
  * the second graph algorithm family next to the connected-components
  * fixpoint (`dedup_clusters`): PageRank centrality across the LSH
  * candidate edges.
  *
  * Why a pipeline wants it: connected components answer "which docs
  * form one duplication family"; PageRank answers "which member is the
  * family's CENTER" — the template a boilerplate family mutated from,
  * the canonical page a mirror farm copied. High-centrality nodes are
  * better keep-best canonicals than longest-doc heuristics when the
  * family is a hub-and-spoke (one origin, many light edits), and
  * extreme-centrality nodes flag machine-generated template farms.
  *
  * Determinism: the whole computation is scaled-integer — p₀ = 10¹²//n,
  * damping 0.85 as `(85·p)//100`, per-edge contribution floored by the
  * out-degree — so three unrolled iterations hash-match the DuckDB
  * oracle exactly (the engine-defined float summation order that makes
  * textbook PageRank irreproducible never appears).
  *
  * Scale shape: the edge table derives from the persisted minhash band
  * store (never a text re-hash), is pre-hash-partitioned on the probe
  * key and pinned once (the [[TextQueries.clusterAssignments]] trick —
  * each iteration re-shuffles only the node-cardinality rank table,
  * the edges never move); every node of the undirected graph has
  * deg ≥ 1, so there is no dangling-mass term to redistribute.
  */
object GraphQueries {

  val Iters = 3

  private lazy val PageRankOracleSql: String = {
    val iters = (1 to Iters).map { k =>
      s"""p$k AS (
         |  SELECT e.b AS v, CAST((150000000000 // nn.n) + sum(((85 * p.p) // 100) // d.deg) AS BIGINT) AS p
         |  FROM edges e JOIN p${k - 1} p ON p.v = e.a JOIN deg d ON d.a = e.a
         |  CROSS JOIN nn
         |  GROUP BY e.b, nn.n)""".stripMargin
    }
    s"""WITH ${TextQueries.MinhashBandsCte},
       |pairs AS (${TextQueries.BandedPairsSelect}),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
       |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY a),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
       |p0 AS (SELECT deg.a AS v, 1000000000000 // nn.n AS p FROM deg CROSS JOIN nn),
       |${iters.mkString(",\n")}
       |SELECT d.a AS doc_id, d.deg, p.p AS pr_x1e12
       |FROM deg d JOIN p$Iters p ON p.v = d.a
       |ORDER BY doc_id""".stripMargin
  }

  def defs: Map[String, QueryDef] = Map(

    // ----- PageRank centrality over the near-dup candidate graph -----
    // Three damped iterations in exact scaled-integer arithmetic over
    // the band-store edges (both directions of every LSH candidate
    // pair); isolated docs are excluded — their rank is the uniform
    // constant and would only pad the output. The oracle recomputes the
    // same edges from text and unrolls the iterations.
    "dup_graph_pagerank" -> QueryDef.sql(PageRankOracleSql) { (s, d) =>
      val pairs = TextQueries.bandedPairs(SignatureStore.ensureMinhashBands(s, d))
      val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
        .unionByName(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
        .repartition(col("a"))
        .localCheckpoint()
      val deg = edges.groupBy("a").agg(count(lit(1)).as("deg")).localCheckpoint(true)
      val nRow = deg.agg(count(lit(1)).as("n"))
      var p = deg.crossJoin(broadcast(nRow))
        .select(col("a").as("v"), expr("1000000000000L div n").as("p"))
        .localCheckpoint(true)
      for (_ <- 1 to Iters) {
        p = edges.join(p, edges("a") === p("v")).join(deg, Seq("a"))
          .select(col("b"), expr("((85 * p) div 100) div deg").as("c"))
          .groupBy(col("b")).agg(sum("c").as("contrib"))
          .crossJoin(broadcast(nRow))
          .select(col("b").as("v"),
            expr("(150000000000L div n) + contrib").as("p"))
          .localCheckpoint(true)
      }
      p.join(deg, p("v") === deg("a"))
        .select(col("v").as("doc_id"), col("deg"), col("p").as("pr_x1e12"))
        .orderBy("doc_id")
    },
  )
}
