package graft.operators

import graft.QueryDef
import graft.util.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Brute-force cosine is the correctness baseline; the 100 TB scale path is
  * the bucketed variant (`ann_lsh_topk`): random-hyperplane signs → bucket
  * equi-join, so candidate generation is a shuffle on a small key instead of
  * an all-pairs product. Scores are rounded to 6 decimals before ranking so
  * JVM-vs-DuckDB float summation order can never flip a rank.
  */
object VectorQueries {

  /** cosine(a, b) over double arrays, sequential fold (deterministic). */
  private def cosine(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) /
       |(sqrt(aggregate($a, 0D, (acc, x) -> acc + x * x)) *
       | sqrt(aggregate($b, 0D, (acc, x) -> acc + x * x)))""".stripMargin)

  private def vecs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
      col("vec_id"),
      expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"),
      col("label"))

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
      val q = vecs(s, d).filter(col("vec_id") < 100).select(col("vec_id").as("qid"), col("v").as("qv"))
      val c = vecs(s, d).select(col("vec_id").as("cid"), col("v").as("cv"))
      val scored = c.crossJoin(broadcast(q))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), round(cosine("qv", "cv"), 6).as("score"))
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
      val a = vecs(s, d).select(col("vec_id").as("vec_a"), col("v").as("va"))
      val b = vecs(s, d).select(col("vec_id").as("vec_b"), col("v").as("vb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"), round(cosine("va", "vb"), 6).as("score"))
        .filter(col("score") > 0.9)
        .orderBy("vec_a", "vec_b")
    },

    // ----- LSH-bucketed ANN (scale path): hyperplane-sign buckets -----
    // Deterministic pseudo-random hyperplanes from xxhash64(plane, dim);
    // bucket equi-join replaces the all-pairs product. Rows-only check
    // (bucketing uses Spark's xxhash64, not expressible in DuckDB).
    "ann_lsh_bucketed" -> QueryDef.rowsOnly { (s, d) =>
      val planes = 8
      val v = vecs(s, d)
      // sign bit per plane: dot(v, h_p) > 0 where h_p[i] ∈ {-1, +1} from xxhash64
      val bucketed = v.withColumn("bucket", expr(
        s"""aggregate(
           |  transform(sequence(0, ${planes - 1}), p ->
           |    IF(aggregate(
           |         zip_with(v, transform(sequence(0, 63), i -> IF((xxhash64(p * 64 + i) & 1) = 1, 1D, -1D)),
           |                  (x, h) -> x * h),
           |         0D, (acc, x) -> acc + x) > 0, shiftleft(1L, p), 0L)),
           |  0L, (a, b) -> a | b)""".stripMargin))
      val a = bucketed.select(col("vec_id").as("vec_a"), col("v").as("va"), col("bucket"))
      val b = bucketed.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("bucket"))
      a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"), round(cosine("va", "vb"), 6).as("score"))
        .filter(col("score") > 0.9)
        .orderBy("vec_a", "vec_b")
    },
  )
}
