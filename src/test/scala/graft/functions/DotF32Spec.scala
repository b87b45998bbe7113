package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class DotF32Spec extends SparkFunSuite {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -1.5f, 2.0f), Array(2.0f, 2.0f, 2.0f)),
  ).toDF("id", "a", "b")

  test("dot_f32 matches the element-wise double sum (Column API)") {
    val rows = df.select($"id", DotF32.dot_f32($"a", $"b").as("d")).orderBy("id").collect()
    assert(rows(0).getDouble(1) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    assert(rows(1).getDouble(1) == 0.5 * 2 + -1.5 * 2 + 2.0 * 2)
  }

  test("dot_f32 is callable from SQL via GraftExtensions") {
    df.createOrReplaceTempView("dotf32_t")
    val r = spark.sql("SELECT dot_f32(a, a) AS n FROM dotf32_t WHERE id = 1").collect().head
    assert(r.getDouble(0) == 1.0 + 4.0 + 9.0)
  }

  test("dot_f32 null and type handling") {
    val withNull = Seq((Option.empty[Array[Float]], Array(1.0f))).toDF("a", "b")
    assert(withNull.select(DotF32.dot_f32($"a", $"b")).collect().head.isNullAt(0))
    intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(DotF32.dot_f32($"a", $"b")).collect()
    }
  }

  test("dot_f32 survives codegen (no interpreted fallback in plan)") {
    // a local Seq constant-folds to LocalTableScan; force a real scan
    val dir = tmpDir("dotf32") + "/t.parquet"
    df.write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir).select(DotF32.dot_f32($"a", $"b").as("d"))
    // "*(1)" prefixes mark WholeStageCodegen stages in the plan string
    assert(scan.queryExecution.executedPlan.toString.contains("*(1) Project [dotf32"))
    assert(scan.orderBy("d").collect().map(_.getDouble(0)).toSeq == Seq(2.0, 32.0))
  }
}
