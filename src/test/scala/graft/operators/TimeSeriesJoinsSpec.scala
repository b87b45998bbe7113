package graft.operators

import graft.{SparkFunSuite, TestRng}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property checks: the scalable shapes must agree exactly with naive
  * reference implementations on randomized inputs (the fixed-testdata
  * oracle gate can't explore bucket boundaries / tie patterns the way
  * random keys and times do).
  */
class TimeSeriesJoinsSpec extends SparkFunSuite {

  private def randomSides(seed: Long, n: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rng = new TestRng(seed)
    // coarse time range with many collisions: exercises equal-time ties
    // and bucket-boundary cases
    def rows(idBase: Long) = (0 until n).map { i =>
      (rng.nextLong().abs % 7, rng.nextLong().abs % 1000, idBase + i)
    }
    (rows(0).toDF("k", "t", "id"), rows(100000).toDF("k", "t", "id"))
  }

  test("asofJoin equals the naive latest-at-or-before lookup on random data") {
    val (left, right) = randomSides(0xA50F1L, 400)
    val got = TimeSeriesJoins.asofJoin(left, right, "k", "t", "id")
      .select("k", "t", "id", "right_t", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    // naive: per left row, the max (t, id) right row with t <= left.t
    val naiveW = Window.partitionBy(col("lk"), col("lt"), col("lid"))
      .orderBy(col("rt").desc, col("rid").desc)
    val naive = left.select(col("k").as("lk"), col("t").as("lt"), col("id").as("lid"))
      .join(right.select(col("k").as("rk"), col("t").as("rt"), col("id").as("rid")),
        col("lk") === col("rk") && col("rt") <= col("lt"), "left")
      .withColumn("rn", row_number().over(naiveW))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(4)), Option(r.get(5)))).toSet
    assert(got == naive)
    assert(got.size == 400)
  }

  test("rangeJoin equals the naive inequality join on random data") {
    val (left, right) = randomSides(0x4A11EEL, 300)
    val width = 50L
    val got = TimeSeriesJoins.rangeJoin(left, right, "k", "t", width)
      .select("k", "t", "id", "right_t", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val naive = left.select(col("k"), col("t"), col("id"))
      .join(right.select(col("k").as("rk"), col("t").as("right_t"), col("id").as("right_id")),
        col("k") === col("rk") &&
          col("right_t") >= col("t") - width && col("right_t") <= col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == naive)
    assert(naive.nonEmpty, "test data must actually produce matches")
  }

  test("asofJoin works when the left side lacks the tiebreak column") {
    // Regression: the tiebreak is a right-side concept, but the window
    // used to order by the post-union column of that name — which only
    // survived the union when the LEFT schema happened to contain it too.
    import spark.implicits._
    val left = Seq((1L, 20L, "x"), (1L, 4L, "y")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, 50L, "a"), (1L, 5L, 51L, "b"), (1L, 15L, 52L, "c"))
      .toDF("k", "t", "id", "rv")
    val got = TimeSeriesJoins.asofJoin(left, right, "k", "t", "id")
      .select("t", "lv", "right_id", "right_rv")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got == Set(
      (20L, "x", Some(52L), Some("c")),
      (4L, "y", None, None))) // no right row at or before t=4
  }

  test("asofJoin carries the matched row atomically when right values are null") {
    import spark.implicits._
    // right row at t=10 has a NULL value column; a per-column
    // last_value(IGNORE NULLS) would smuggle v from the EARLIER row
    val left = Seq((1L, 20L, 1L)).toDF("k", "t", "id")
    val right = Seq((1L, 5L, 50L, Some("old")), (1L, 10L, 51L, Option.empty[String]))
      .toDF("k", "t", "id", "v")
    val row = TimeSeriesJoins.asofJoin(left, right, "k", "t", "id").collect().head
    assert(row.getAs[Long]("right_id") == 51L)
    assert(row.isNullAt(row.fieldIndex("right_v")),
      "matched row must be atomic — no cross-row column mixing")
  }
}
