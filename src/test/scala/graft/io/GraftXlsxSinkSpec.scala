package graft.io

import java.util.zip.ZipFile

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The V2 write connector must (a) round the full commit protocol —
  * executor-side row serialization, driver-side ordered assembly —
  * into a valid workbook, (b) respect partition-id ordering, and (c)
  * honor overwrite. */
class GraftXlsxSinkSpec extends SparkFunSuite {

  private def sheetXml(path: String): String = {
    val zf = new ZipFile(path)
    try {
      val e = zf.getEntry("xl/worksheets/sheet1.xml")
      val in = zf.getInputStream(e)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } finally zf.close()
  }

  test("writes a valid workbook through the V2 commit protocol") {
    val path = tmpDir("xlsxsink") + "/meta.xlsx"
    val df = spark.range(6).select(col("id"),
      concat(lit("layer_"), col("id")).as("name"),
      (col("id") * 10).cast("double").as("angle"))
    df.repartition(3, col("id")).write.format("graft-xlsx")
      .mode("overwrite").save(path)
    val xml = sheetXml(path)
    assert(xml.contains("name") && xml.contains("angle"), "header row")
    (0 until 6).foreach { i =>
      assert(xml.contains(s"layer_$i"), s"row $i present")
    }
    assert(xml.contains("50.0"), "double stringification")
  }

  test("partition-id ordering makes the row order deterministic") {
    val path = tmpDir("xlsxord") + "/o.xlsx"
    // range with 2 ordered partitions: rows 0-2 in partition 0, 3-5 in 1
    spark.range(6).select(concat(lit("r"), col("id")).as("v"))
      .coalesce(2)
      .write.format("graft-xlsx").mode("overwrite").save(path)
    val xml = sheetXml(path)
    val order = (0 until 6).map(i => xml.indexOf(s">r$i<"))
    assert(order.forall(_ >= 0), s"all rows present: $order")
    assert(order == order.sorted, s"rows in partition order: $order")
  }

  test("overwrite replaces the previous workbook") {
    val path = tmpDir("xlsxow") + "/w.xlsx"
    spark.range(2).select(lit("old").as("v"))
      .write.format("graft-xlsx").mode("overwrite").save(path)
    spark.range(2).select(lit("new").as("v"))
      .write.format("graft-xlsx").mode("overwrite").save(path)
    val xml = sheetXml(path)
    assert(xml.contains("new") && !xml.contains("old"))
  }

  test("dates and timestamps render human-readable, not raw epoch ints") {
    val path = tmpDir("xlsxdate") + "/d.xlsx"
    spark.range(1).select(
      to_date(lit("1995-03-15")).as("d"),
      to_timestamp(lit("1995-03-15 12:30:00")).as("ts"))
      .write.format("graft-xlsx").mode("overwrite").save(path)
    val xml = sheetXml(path)
    assert(xml.contains("1995-03-15"), s"date cell readable: $xml")
    // Catalyst's raw int would be 9204 days / 795270600000000 micros
    assert(!xml.contains(">9204<"), "days-since-epoch leaked into the cell")
    assert(xml.contains("12:30"), s"timestamp carries time of day: $xml")
  }

  test("null values become empty cells, not the string null") {
    val path = tmpDir("xlsxnull") + "/n.xlsx"
    spark.range(1).select(lit(null).cast("string").as("a"), lit("x").as("b"))
      .write.format("graft-xlsx").mode("overwrite").save(path)
    val xml = sheetXml(path)
    assert(!xml.contains(">null<"))
    assert(xml.contains(">x<"))
  }
}
