package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The native [[HllRegistersAgg]] must agree with the relational
  * register fold ([[graft.operators.SketchQueries.hllRegisters]])
  * group-for-group — same (s, n_regs) from one 256-byte buffer as from
  * the (stratum, idx)-keyed aggregate — and must be callable from SQL
  * through the injected registry entry. */
class HllAggSpec extends SparkFunSuite {

  private def hashed(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (s"g${i % 7}", i.toLong)).toDF("stratum", "user_id")
      .select(col("stratum"),
        conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
  }

  test("native buffer agg equals the relational register fold per stratum") {
    val h = hashed(5000).localCheckpoint()
    val native = h.groupBy("stratum")
      .agg(call_function("hll_registers_agg", col("h")).as("hr"))
      .select(col("stratum"), col("hr.s").as("s"), col("hr.n_regs").as("n_regs"))
    // the relational reference, built directly from the same hash
    // column (hllRegisters itself re-hashes raw values; the agreement
    // on the full pipeline is what the hll_user_days oracle checks)
    val ref = h
      .groupBy(col("stratum"), pmod(col("h"), lit(256)).as("idx"))
      .agg(max(expr("CASE WHEN h div 256 = 0 THEN 53 " +
        "ELSE 53 - length(bin(h div 256)) END")).as("m"))
      .groupBy("stratum")
      .agg((sum(expr("shiftleft(1L, cast(53 - m as int))"))
          + (lit(256L) - count(lit(1))) * lit(1L << 53)).as("s"),
        count(lit(1)).as("n_regs"))
    val a = native.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val b = ref.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)
    assert(a.length == 7)
  }

  test("hll_registers_agg is SQL-callable via the injected registry entry") {
    hashed(1000).createOrReplaceTempView("hll_spec_in")
    val rows = spark.sql(
      """SELECT stratum, hll_registers_agg(h).n_regs AS n_regs
        |FROM hll_spec_in GROUP BY stratum ORDER BY stratum""".stripMargin).collect()
    assert(rows.length == 7 && rows.forall(_.getLong(1) > 0))
  }

  test("merge is byte-wise MAX: splitting the input changes nothing") {
    val h = hashed(4000).localCheckpoint()
    def sOf(df: org.apache.spark.sql.DataFrame) = df
      .agg(call_function("hll_registers_agg", col("h")).as("hr"))
      .select(col("hr.s")).collect().head.getLong(0)
    val whole = sOf(h)
    // repartition forces real partial/merge paths over different splits
    assert(sOf(h.repartition(13)) == whole)
    assert(sOf(h.repartition(1)) == whole)
  }
}
