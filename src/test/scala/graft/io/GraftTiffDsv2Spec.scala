package graft.io

import graft.{Fixtures, SparkFunSuite}
import org.apache.spark.sql.functions._

/** The DataSource V2 TIFF source must (a) agree row-for-row with the
  * binaryFile+flatMap source, (b) carry azimuth predicates into the
  * scan, and (c) prove the pushdown skips BLOCK DECOMPRESSION, not just
  * rows. */
class GraftTiffDsv2Spec extends SparkFunSuite {

  private lazy val grdDir: String = Fixtures.writeTiffStack(tmpDir("dsv2grd"))

  private def v2 = spark.read.format("graft-tiff").load(grdDir)

  test("reads the same rows as TiffPixelSource") {
    val want = TiffPixelSource.readPixels(spark,
        GraftTiffSource.listRasters(grdDir))
      .select(col("_fpath").as("path"), col("azimuth"), col("range"), col("intensity"))
      .collect().map(_.toSeq).toSet
    val got = v2.select("path", "azimuth", "range", "intensity")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("azimuth predicates reach the scan and results stay exact") {
    val q = v2.filter(col("azimuth") >= 3 && col("azimuth") <= 4)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("azimuth"), s"expected pushed azimuth bound:\n$plan")
    val want = TiffPixelSource.readPixels(spark,
        GraftTiffSource.listRasters(grdDir))
      .filter(col("azimuth") >= 3 && col("azimuth") <= 4)
      .select(col("azimuth"), col("range"), col("intensity"))
      .collect().map(_.toSeq).toSet
    val got = q.select("azimuth", "range", "intensity")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("a narrow azimuth bound decompresses fewer blocks (IO pruning, not row filtering)") {
    // both sides filtered so neither takes the count(*) header-only path
    Tiff.blocksDecompressed.set(0)
    v2.filter(col("azimuth") >= 0).count()
    val full = Tiff.blocksDecompressed.get()
    Tiff.blocksDecompressed.set(0)
    v2.filter(col("azimuth") === 0).count()
    val pruned = Tiff.blocksDecompressed.get()
    assert(full > 0)
    assert(pruned < full,
      s"azimuth=0 should touch fewer blocks than the full scan ($pruned vs $full)")
  }

  test("bare count(*) answers from headers alone: zero blocks decompressed") {
    val want = TiffPixelSource.readPixels(spark,
      GraftTiffSource.listRasters(grdDir)).count()
    Tiff.blocksDecompressed.set(0)
    val got = v2.count()
    assert(got == want && got > 0)
    assert(Tiff.blocksDecompressed.get() == 0,
      "a pushed count(*) must not decode any pixel block")
  }

  test("column pruning narrows the scan's read schema") {
    val q = v2.select("azimuth", "range")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") || !plan.contains("intensity"),
      s"expected a pruned scan schema:\n$plan")
    assert(q.columns.toSeq == Seq("azimuth", "range"))
    assert(q.count() > 0)
  }
}
