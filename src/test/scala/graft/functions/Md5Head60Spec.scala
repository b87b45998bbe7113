package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** [[Md5Head60]] must be exactly the builtin
  * `CAST(conv(substring(md5(CAST(x AS BINARY)), 1, 15), 16, 10) AS BIGINT)`
  * chain it replaced across the sketch/DSIR/HLL families. */
class Md5Head60Spec extends SparkFunSuite {

  test("md5_head60 ≡ conv(substring(md5(binary),1,15),16,10) cast long") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    val strings = Seq(null, "", "a", "0#token", "héllo wörld", "日本語",
      "x" * 200) ++ Seq.fill(300)(rnd.ints(rnd.nextInt(30), 32, 127)
        .toArray.map(_.toChar).mkString)
    val df = strings.toDF("s")
    val mismatches = df.select(
        col("s"),
        conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("expect"),
        Md5Head60.md5_head60(col("s")).as("got"))
      .filter(!(col("expect") <=> col("got")))
      .collect()
    assert(mismatches.isEmpty, mismatches.take(5).mkString("\n"))
  }
}
