package graft.util

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkFunSuite {
  import spark.implicits._

  test("saltedCount equals plain groupBy count on skewed data") {
    // one hot key with 10k rows, 50 cold keys
    val df = spark.range(10000).select(lit("hot").as("k"))
      .unionByName(spark.range(50).select(concat(lit("cold_"), col("id")).as("k")))
    val salted = Scale.saltedCount(df, col("k"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = df.groupBy("k").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
    assert(salted("hot") == 10000L)
  }

  test("saltedJoin equals plain join") {
    val fact = spark.range(5000).select((col("id") % 3).cast("int").as("k"), col("id").as("v"))
    val dim = Seq((0, "a"), (1, "b"), (2, "c"), (9, "unused")).toDF("k", "name")
    val salted = Scale.saltedJoin(fact, dim, "k", salts = 4)
      .groupBy("name").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = fact.join(dim, Seq("k"))
      .groupBy("name").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }
}
