package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class DotI8Spec extends SparkFunSuite {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq[Byte](1, 2, 3), Seq[Byte](4, 5, 6)),
    (2L, Seq[Byte](-127, 127, 0), Seq[Byte](127, 127, 9)),
  ).toDF("id", "a", "b")

  test("dot_i8 is the exact integer dot (Column API)") {
    val rows = df.select($"id", DotI8.dot_i8($"a", $"b").as("d")).orderBy("id").collect()
    assert(rows(0).getLong(1) == 4L + 10L + 18L)
    assert(rows(1).getLong(1) == -127L * 127 + 127L * 127 + 0L)
  }

  test("dot_i8 is callable from SQL via GraftExtensions") {
    df.createOrReplaceTempView("doti8_t")
    val r = spark.sql("SELECT dot_i8(a, a) AS n FROM doti8_t WHERE id = 2").collect().head
    assert(r.getLong(0) == 127L * 127 * 2)
  }

  test("dot_i8 null and type handling") {
    val withNull = Seq((Option.empty[Seq[Byte]], Seq[Byte](1))).toDF("a", "b")
    assert(withNull.select(DotI8.dot_i8($"a", $"b")).collect().head.isNullAt(0))
    intercept[Exception] {
      Seq((1.0f, 2.0f)).toDF("a", "b").select(DotI8.dot_i8($"a", $"b")).collect()
    }
  }

  test("dot_i8 survives codegen (no interpreted fallback in plan)") {
    val dir = tmpDir("doti8") + "/t.parquet"
    df.write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir).select(DotI8.dot_i8($"a", $"b").as("d"))
    assert(scan.queryExecution.executedPlan.toString.contains("*(1) Project [doti8"))
    assert(scan.orderBy("d").collect().map(_.getLong(0)).toSet == Set(32L, 0L))
  }

  test("quantizeInt8 codes stay in [-127, 127] and the extreme maps to ±127") {
    val e = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(3.0f, 0.0f, -3.0f))).toDF("vec_id", "embedding")
    val q = graft.operators.VectorQueries.quantizeInt8(e)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(q(1L) == Seq[Byte](64, -127, 32)) // floor(0.5*127/1 + .5)=64, -127, floor(31.75+.5)=32
    assert(q(2L) == Seq[Byte](127, 0, -127))
    assert(q.values.flatten.forall(b => b >= -127 && b <= 127))
  }
}
