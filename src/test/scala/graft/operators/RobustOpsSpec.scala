package graft.operators

import graft.{SparkFunSuite, TestRng}
import org.apache.spark.sql.functions._

/** Property tests for the wave-9 relational additions: SymSpell
  * blocking completeness, Allen-relation algebra laws, and the IVM
  * merge==recompute law on the fixture feed. */
class RobustOpsSpec extends SparkFunSuite {

  test("symspellPairs finds EXACTLY the brute-force levenshtein<=1 pairs") {
    import spark.implicits._
    // adversarial pool: small alphabet + short lengths maximize
    // collisions, shared deletion keys at distance 2 (transpositions
    // like ab<->ba via key 'a'/'b'), duplicates of every edit class
    val rng = new TestRng(0x5eed5eedL)
    val alpha = "abc"
    val words = (1 to 90).map { _ =>
      val len = 1 + (rng.nextLong().abs % 6).toInt
      (1 to len).map(_ => alpha((rng.nextLong().abs % alpha.length).toInt)).mkString
    }.distinct
    val names = words.toDF("name").localCheckpoint()
    val gotRows = RelationalQueries.symspellPairs(names)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // exactly-once multiplicity: symspellPairs emits each verified pair
    // ONCE without a distinct (a lev<=1 pair shares exactly one deduped
    // deletion key — the spill-audit fix relies on this)
    assert(gotRows.size == gotRows.distinct.size,
      s"duplicate pair emissions: ${gotRows.groupBy(identity).collect {
        case (p, occ) if occ.size > 1 => p }.take(5)}")
    val got = gotRows.toSet
    val brute = names.select(col("name").as("na"))
      .crossJoin(names.select(col("name").as("nb")))
      .filter(col("na") < col("nb") && levenshtein(col("na"), col("nb")) <= 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === brute)
    assert(brute.nonEmpty) // the pool actually exercises the join
    // transpositions share a deletion key but sit at distance 2 — the
    // verify step must have filtered them (spot-check one if present)
    val trans = for {
      a <- words; if a.length >= 2
      b = a.substring(0, a.length - 2) + a.charAt(a.length - 1) + a.charAt(a.length - 2)
      if b != a && words.contains(b) && a < b
    } yield (a, b)
    trans.foreach { p =>
      val d = org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
        .apply(p._1, p._2)
      if (d > 1) assert(!got.contains(p))
    }
  }

  test("allenRelation is total and inverse-consistent on random intervals") {
    import spark.implicits._
    val rng = new TestRng(0xa11e4L)
    // boundaries drawn from a TINY domain so every equality case
    // (shared starts/ends, meets, point intervals, full equality)
    // occurs many times
    val iv = (1 to 400).map { i =>
      val s = (rng.nextLong().abs % 6).toInt
      val e = s + (rng.nextLong().abs % 6).toInt
      (i.toLong, s.toLong, e.toLong)
    }
    val pairs = iv.flatMap { case (i, sa, ea) =>
      iv.collect { case (j, sb, eb) if j != i => (i, j, sa, ea, sb, eb) }
    }.toDF("i", "j", "sa", "ea", "sb", "eb")
    val rel = pairs.withColumn("fwd",
        RelationalQueries.allenRelation(col("sa"), col("ea"), col("sb"), col("eb")))
      .withColumn("bwd",
        RelationalQueries.allenRelation(col("sb"), col("eb"), col("sa"), col("ea")))
      .select("fwd", "bwd").collect()
    val inv = Map(
      "equals" -> "equals", "before" -> "after", "after" -> "before",
      "meets" -> "met_by", "met_by" -> "meets",
      "starts" -> "started_by", "started_by" -> "starts",
      "finishes" -> "finished_by", "finished_by" -> "finishes",
      "during" -> "contains", "contains" -> "during",
      "overlaps" -> "overlapped_by", "overlapped_by" -> "overlaps")
    rel.foreach { r =>
      val (f, b) = (r.getString(0), r.getString(1))
      assert(inv.contains(f), s"non-Allen label $f")
      assert(inv(f) === b, s"inverse of $f was $b")
    }
    // the tiny domain must have exercised every one of the 13 relations
    val seen = rel.map(_.getString(0)).toSet
    assert(seen === inv.keySet, s"missing relations: ${inv.keySet -- seen}")
  }

  test("er_fuzzy_name_join plan: blocked equi-join, never a quadratic scan") {
    val df = RelationalQueries.defs("er_fuzzy_name_join")
      .build(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("u7_ivm_refresh: merged state equals recompute everywhere, retractions real") {
    val out = RelationalQueries.defs("u7_ivm_refresh")
      .build(spark, "/root/testdata/sf0.001")
      .agg(sum(when(col("consistent") === 1, 0L).otherwise(1L)).as("bad"),
        sum("n_merged").as("kept"))
      .collect()(0)
    assert(out.getLong(0) === 0L)
    val raw = graft.util.Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(out.getLong(1) < raw) // the retraction feed removed rows
  }
}
