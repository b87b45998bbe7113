package graft.operators

import graft.QueryDef
import graft.util.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Brute-force cosine is the correctness baseline; the 100 TB scale path is
  * the bucketed variant (`ann_lsh_bucketed`): random-hyperplane signs →
  * bucket equi-join, so candidate generation is a shuffle on a small key
  * instead of an all-pairs product. Scores are rounded to 6 decimals before
  * ranking so JVM-vs-DuckDB float summation order can never flip a rank.
  *
  * Perf notes (measured at sf0.1, 2k×2k pairs):
  *   - NO array HOFs (`transform`/`aggregate`/`zip_with`): they are
  *     CodegenFallback AND get inlined by projection collapse, so the
  *     lambda re-evaluates per element_at — ~25× slowdown. The dot product
  *     is an explicit 64-term `element_at(...).cast(double)` sum, fully
  *     whole-stage-codegen'd.
  *   - all-pairs generation runs on bare ids (cheap nested-loop), vectors
  *     attach afterwards via broadcast hash joins, so the score expression
  *     evaluates inside a codegen stage, never inside the BNLJ condition.
  */
object VectorQueries {

  val Dim = 64

  private def elem(a: String, i: Int): Column = element_at(col(a), i).cast("double")

  /** Sequential left-fold sum — same IEEE order as an aggregate() fold. */
  private def dot(a: String, b: String): Column =
    (1 to Dim).map(i => elem(a, i) * elem(b, i)).reduce(_ + _)

  private def norm(a: String): Column =
    sqrt((1 to Dim).map(i => elem(a, i) * elem(a, i)).reduce(_ + _))

  private def score(a: String, b: String): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** All-pairs (a < b) with both embeddings attached via broadcast hash
    * joins, so the score evaluates in a codegen stage. (Precomputing norms
    * as broadcast columns measured ~3× SLOWER here — the score filter then
    * merges into the hash-join condition and breaks the codegen pipeline —
    * so norms are computed inline in [[score]].) */
  private def pairs(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val ids = e.select(col("vec_id"))
    val idPairs = ids.select(col("vec_id").as("vec_a"))
      .join(broadcast(ids.select(col("vec_id").as("vec_b"))), col("vec_a") < col("vec_b"))
    idPairs
      .join(broadcast(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))), Seq("vec_a"))
      .join(broadcast(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))), Seq("vec_b"))
  }

  val defs: Map[String, QueryDef] = Map(

    // ----- brute-force cosine top-k (k=3) for a query subset -----
    "ann_topk_bruteforce" -> QueryDef.sql(
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 100),
        |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT qid, cid, round(list_cosine_similarity(qv, cv), 6) AS score
        |      FROM q, c WHERE qid <> cid)
        |SELECT qid, cid, score FROM s
        |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) <= 3
        |ORDER BY qid, cid""".stripMargin) { (s, d) =>
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") < 100).select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val scored = c.crossJoin(broadcast(q))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), score("qv", "cv").as("score"))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("qid", "cid", "score").orderBy("qid", "cid")
    },

    // ----- embedding-cosine near-dup pairs (threshold on rounded score) -----
    "dedup_embedding_cosine" -> QueryDef.sql(
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS score
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) > 0.9
        |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
      pairs(s, d)
        .select(col("vec_a"), col("vec_b"), score("ea", "eb").as("score"))
        .filter(col("score") > 0.9)
        .orderBy("vec_a", "vec_b")
    },

    // ----- LSH-bucketed ANN (scale path): hyperplane-sign buckets -----
    // Deterministic pseudo-random hyperplane signs from xxhash64(plane*64
    // + dim) — constant-folded per plane/dim. Bucket equi-join replaces
    // the all-pairs product. Rows-only check (xxhash64 signs are not
    // expressible in DuckDB).
    "ann_lsh_bucketed" -> QueryDef.rowsOnly { (s, d) =>
      val planes = 8
      val planeDot = (p: Int, v: String) =>
        (1 to Dim).map { i =>
          val sign = when((xxhash64(lit(p * Dim + i)) % 2) === 0, 1.0).otherwise(-1.0)
          elem(v, i) * sign
        }.reduce(_ + _)
      val bucket = (v: String) => (0 until planes).map(p =>
        when(planeDot(p, v) > 0, lit(1L << p)).otherwise(lit(0L))).reduce(_.bitwiseOR(_))
      val e = embeddings(s, d)
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        bucket("embedding").as("bucket"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        bucket("embedding").as("bucket"))
      a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"), score("ea", "eb").as("score"))
        .filter(col("score") > 0.9)
        .orderBy("vec_a", "vec_b")
    },
  )
}
