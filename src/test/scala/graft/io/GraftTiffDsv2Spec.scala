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

  test("a pushed LIMIT stops block decompression, results stay exact") {
    // full collect decompresses every block; LIMIT 3 needs ceil(3/width)
    // azimuth rows per file, so the lazy strip iterator never inflates
    // the rest. Partially-pushed contract: Spark's own Limit still caps
    // the global row count, so correctness never depends on the reader.
    Tiff.blocksDecompressed.set(0)
    assert(v2.select("azimuth", "range", "intensity").collect().nonEmpty)
    val full = Tiff.blocksDecompressed.get()
    Tiff.blocksDecompressed.set(0)
    val q = v2.select("azimuth", "range", "intensity").limit(3)
    val rows = q.collect()
    val limited = Tiff.blocksDecompressed.get()
    assert(rows.length == 3)
    assert(full > 0 && limited < full,
      s"LIMIT 3 should decompress fewer blocks than the full scan ($limited vs $full)")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 3"), s"expected the pushed limit in:\n$plan")
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

  test("min/max(azimuth|range) answer from headers alone: zero blocks decompressed") {
    // azimuth spans 0..height-1 and range 0..width-1 by construction,
    // so the extrema are header-derivable exactly like count(*)
    val want = TiffPixelSource.readPixels(spark,
        GraftTiffSource.listRasters(grdDir))
      .agg(min("azimuth"), max("azimuth"), min("range"), max("range"))
      .collect().head.toSeq
    Tiff.blocksDecompressed.set(0)
    val q = v2.agg(min("azimuth"), max("azimuth"), min("range"), max("range"))
    val plan = q.queryExecution.executedPlan.toString
    val got = q.collect().head.toSeq
    assert(got == want, s"pushed stats $got != exact $want")
    assert(Tiff.blocksDecompressed.get() == 0,
      "pushed min/max must not decode any pixel block")
    assert(plan.contains("PushedAggregates") || !plan.contains("FileScan"),
      s"expected the header-stats scan in the plan:\n$plan")
  }

  test("min/max does NOT push under a residual filter (defensive gate)") {
    // with an azimuth filter pushed, the builder must fall back to the
    // full scan — header extrema would be wrong for the filtered rows
    val want = TiffPixelSource.readPixels(spark,
        GraftTiffSource.listRasters(grdDir))
      .filter(col("azimuth") >= 2)
      .agg(min("azimuth").as("a"), max("range").as("b"))
      .collect().head.toSeq
    val got = v2.filter(col("azimuth") >= 2)
      .agg(min("azimuth").as("a"), max("range").as("b"))
      .collect().head.toSeq
    assert(got == want, s"filtered stats must come from real rows: $got != $want")
  }

  test("column pruning narrows the scan's read schema") {
    val q = v2.select("azimuth", "range")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") || !plan.contains("intensity"),
      s"expected a pruned scan schema:\n$plan")
    assert(q.columns.toSeq == Seq("azimuth", "range"))
    assert(q.count() > 0)
  }

  test("scan reports exact header-derived row statistics to the planner") {
    val q = v2.select("azimuth", "range", "intensity")
    val stats = q.queryExecution.optimizedPlan.stats
    val actual = q.count()
    assert(stats.rowCount.contains(BigInt(actual)),
      s"planner rowCount ${stats.rowCount} != actual $actual")
    // ...and the size estimate is small enough that a join against a
    // big table BROADCASTS the raster side instead of sort-merging —
    // the planning decision the statistics exist to enable.
    val big = spark.range(200000).select(
      (col("id") % 8).cast("int").as("azimuth"), col("id").as("payload"))
    val j = big.join(v2.select("azimuth", "intensity"), Seq("azimuth"))
    val jplan = j.queryExecution.executedPlan.toString
    assert(jplan.contains("BroadcastHashJoin"),
      s"header-known small scan should broadcast:\n$jplan")
    assert(j.count() > 0)
  }

  test("a pushed DESC top-N decodes only tail blocks, results stay exact") {
    // ORDER BY azimuth DESC LIMIT 3 must read the LAST azimuth rows of
    // each file, never the head — blocks-decompressed proves the tail
    // read; values prove exactness against the full-scan sort
    val want = v2.select("azimuth", "range", "intensity")
      .orderBy(col("azimuth").desc).limit(3)
      .collect().map(_.toSeq).toSet
    Tiff.blocksDecompressed.set(0)
    v2.select("azimuth", "range", "intensity").collect()
    val full = Tiff.blocksDecompressed.get()
    Tiff.blocksDecompressed.set(0)
    val q = v2.select("azimuth", "range", "intensity")
      .orderBy(col("azimuth").desc).limit(3)
    val got = q.collect().map(_.toSeq).toSet
    val topn = Tiff.blocksDecompressed.get()
    assert(got == want && got.nonEmpty)
    assert(full > 0 && topn < full,
      s"DESC top-N should touch fewer blocks ($topn vs $full)")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN") || topn < full,
      s"expected the pushed top-N in the scan description:\n$plan")
  }

  test("runtime V2 filtering: a path join prunes whole rasters at execution") {
    import spark.implicits._
    spark.sparkContext // force session init: listRasters needs it active
    val files = GraftTiffSource.listRasters(grdDir)
    assert(files.size >= 2)
    val target = files.head.replaceFirst("^file:/*", "/")
    // the dimension must be a SELECTIVELY FILTERED real relation — a
    // filtered LocalRelation constant-folds to a bare LocalTableScan,
    // which the pruning rule correctly sees as having no predicate to
    // reuse (found the hard way; this mirrors production, where the
    // manifest IS a table)
    // filter the manifest on a NON-key column: an equality on the join
    // key itself constant-propagates into a static path filter on the
    // scan (the static-pushdown test below) and no runtime filter is
    // needed — the dynamic case is precisely "the path set is only
    // known after the dimension is evaluated"
    val dimPath = tmpDir("dsv2dim")
    files.map(_.replaceFirst("^file:/*", "/")).zipWithIndex
      .toDF("path", "idx").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("idx") === 0)
    GraftTiffScan.runtimeFilteredTo.set(-1)
    GraftTiffScan.plannedPartitions.set(-1)
    val joined = v2.join(broadcast(dim), Seq("path")).groupBy("path")
      .agg(count(lit(1)).as("n"))
    val rows = joined.collect()
    assert(rows.length == 1 && rows(0).getString(0) == target)
    assert(GraftTiffScan.runtimeFilteredTo.get() == 1,
      "the runtime path filter never reached the scan\n" +
        joined.queryExecution.optimizedPlan.toString + "\n=====\n" +
        joined.queryExecution.executedPlan.toString)
    assert(GraftTiffScan.plannedPartitions.get() == 1,
      s"expected 1 planned raster after runtime pruning, " +
        s"got ${GraftTiffScan.plannedPartitions.get()} of ${files.size}")
    // correctness parity: same rows as an eager path filter
    val want = v2.filter(col("path") === target).count()
    assert(rows(0).getLong(1) == want)
  }

  test("static path pushdown prunes the listing at plan time") {
    spark.sparkContext
    val files = GraftTiffSource.listRasters(grdDir)
    val target = files.head.replaceFirst("^file:/*", "/")
    GraftTiffScan.plannedPartitions.set(-1)
    // an azimuth conjunct rides along so the filtered-count query takes
    // the row scan, never the header-only aggregate path
    val n = v2.filter(col("path") === target && col("azimuth") >= 0).count()
    assert(n > 0)
    assert(GraftTiffScan.plannedPartitions.get() == 1,
      s"path equality should plan exactly 1 raster, " +
        s"got ${GraftTiffScan.plannedPartitions.get()}")
    // an impossible path plans zero partitions, returns zero rows
    GraftTiffScan.plannedPartitions.set(-1)
    assert(v2.filter(col("path") === "/nope.tif" && col("azimuth") >= 0)
      .count() == 0)
    assert(GraftTiffScan.plannedPartitions.get() == 0)
  }
}
