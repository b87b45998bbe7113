package graft.functions

import graft.SparkFunSuite
import graft.functions.MinShingleMd5.min_shingle_md5
import graft.functions.MinhashSigs.minhash_sigs
import org.apache.spark.sql.functions._

/** The native per-row minhash expressions against the explode → groupBy
  * formulation they replaced: identical signatures on the real corpus
  * and on multi-byte text (shingles are CHAR-based, like
  * `substring(text, i, 5)`). */
class MinhashSigsSpec extends SparkFunSuite {
  import spark.implicits._

  private val p = 1000000007L

  private def naiveSigs(docs: org.apache.spark.sql.DataFrame) = {
    val h = conv(substring(md5(col("shingle").cast("binary")), 1, 15), 16, 10).cast("long")
    val hashes = (0 until 8).map(k => min(((h % p) * (2 * k + 3) + 31 * k) % p).as(s"h$k"))
    docs
      .select(col("doc_id"),
        explode(expr("sequence(1, greatest(length(text)-4, 1))")).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 5)").as("shingle"))
      .groupBy("doc_id").agg(hashes.head, hashes.tail: _*)
      .select(col("doc_id"), array((0 until 8).map(k => col(s"h$k")): _*).as("hs"))
  }

  private def sigMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap

  test("minhash_sigs equals the explode+groupBy formulation on the real corpus") {
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val fast = sigMap(docs.select(col("doc_id"), minhash_sigs(col("text")).as("hs")))
    val naive = sigMap(naiveSigs(docs))
    assert(fast.nonEmpty && fast == naive)
  }

  test("min_shingle_md5 equals the explode+groupBy min on the real corpus") {
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val fast = docs.select(col("doc_id"), min_shingle_md5(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val naive = docs
      .select(col("doc_id"),
        explode(expr("sequence(1, greatest(length(text)-4, 1))")).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 5)").as("shingle"))
      .groupBy("doc_id").agg(min(md5(col("shingle").cast("binary"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fast.nonEmpty && fast == naive)
  }

  test("multi-byte and short texts: char-based shingles match substring semantics") {
    val docs = Seq(
      (1L, "héllo wörld ünïcode ßtring"),
      (2L, "ab"),            // shorter than a shingle → one clipped shingle
      (3L, ""),              // empty → md5 of the empty shingle
      (4L, "日本語のテキストです")
    ).toDF("doc_id", "text")
    assert(sigMap(docs.select(col("doc_id"), minhash_sigs(col("text")).as("hs")))
      == sigMap(naiveSigs(docs)))
  }

  test("simhash_sig equals the explode+vote-aggregate formulation") {
    import graft.functions.SimhashSig.simhash_sig
    val real = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val edge = Seq((90001L, "héllo wörld héllo"), (90002L, ""), (90003L, "one"))
      .toDF("doc_id", "text")
    for (docs <- Seq(real, edge)) {
      val toksExpr = "split(trim(lower(text)), '\\\\s+')"
      val toks = docs
        .select(col("doc_id"), explode(expr(s"array_distinct($toksExpr)")).as("t"))
        .withColumn("h",
          conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10).cast("long"))
      val votes = (0 until 60).map(j =>
        sum(shiftright(col("h"), j).bitwiseAND(1)).as(s"o$j")) :+ count(lit(1)).as("n")
      val sigCol = (0 until 60).map(j =>
        when(col(s"o$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
      val naive = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), sigCol.as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fast = docs
        .select(col("doc_id"), simhash_sig(expr(toksExpr)).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast.nonEmpty && fast == naive)
    }
  }

  test("randomized texts: expressions equal naive formulations") {
    // deterministic pseudo-random docs over a mixed alphabet (spaces,
    // repeats, multi-byte chars) — hardens the per-row loops beyond the
    // fixed corpus' character distribution
    val rng = new java.util.Random(0xD1CE5EEDL)
    val alphabet = "ab c déф 語x  y".toCharArray
    val docs = (0 until 60).map { i =>
      val n = rng.nextInt(40)
      val sb = new StringBuilder
      (0 until n).foreach(_ => sb.append(alphabet(rng.nextInt(alphabet.length))))
      (i.toLong, sb.toString)
    }.toDF("doc_id", "text")

    assert(sigMap(docs.select(col("doc_id"), minhash_sigs(col("text")).as("hs")))
      == sigMap(naiveSigs(docs)))

    import graft.functions.SimhashSig.simhash_sig
    val toksExpr = "split(trim(lower(text)), '\\\\s+')"
    val toks = docs
      .select(col("doc_id"), explode(expr(s"array_distinct($toksExpr)")).as("t"))
      .withColumn("h",
        conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1)).as(s"o$j")) :+ count(lit(1)).as("n")
    val sigCol = (0 until 60).map(j =>
      when(col(s"o$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val naiveSim = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sigCol.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fastSim = docs.select(col("doc_id"), simhash_sig(expr(toksExpr)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fastSim == naiveSim)
  }

  test("minhash_sigs stays inside whole-stage codegen") {
    val ranged = spark.range(4)
      .select(minhash_sigs(concat_ws(" ", lit("doc"), col("id"))))
    val plan = ranged.queryExecution.executedPlan
    assert(plan.toString.contains("*(1)"), s"expected codegen:\n$plan")
    assert(ranged.collect().length == 4)
  }
}
