package graft.core

import graft.{Fixtures, SparkFunSuite}
import graft.io.{CubeReader, CubeWriter}
import org.apache.spark.sql.functions._

/** Cube build + accessor goldens, ported from tests/grd_datacube_test.py:46-71
  * (dims, pixel-exact), 88-142 (gap fill) and tests/slc_datacube_test.py
  * (complex variables). */
class CubeSpec extends SparkFunSuite {

  lazy val grdDir: String = Fixtures.writeGrdStack(spark, tmpDir("grdcube"))
  lazy val slcDir: String = Fixtures.writeSlcStack(spark, tmpDir("slccube"))

  test("GRD cube: dims 10x10x3, products ordered 1,0,2") {
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    assert(cube.dimensions == Map("Band" -> 3L, "Azimuth" -> 10L, "Range" -> 10L))
    assert(cube.dataVariables == Seq("intensity"))
    val products = cube.allProducts.map(_.split("_fake_").last)
    assert(products == Seq("1.tif", "0.tif", "2.tif"))
  }

  test("GRD cube: pixel-exact product values") {
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    val pf = Fixtures.grdProducts.head.name // fake_0, source idx 0
    val vals = cube.productValues(pf).orderBy("azimuth", "range")
      .select("intensity").collect().map(_.getDouble(0))
    val expected = for { a <- 0 until 10; r <- 0 until 10 } yield Fixtures.pixelValue(0, a, r)
    assert(vals.toSeq == expected)
    assert(cube.productIndex(pf) == 1) // sorted by date: fake_1 first
  }

  test("xlsx metadata export is a valid OOXML zip with all layers (W2)") {
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    val path = tmpDir("xlsx") + "/metadata.xlsx"
    cube.writeMetadataExcel(path)
    val zf = new java.util.zip.ZipFile(path)
    try {
      val names = zf.entries().asIterator()
      val nameSet = Iterator.continually(names).takeWhile(_.hasNext).map(_.next().getName).toSet
      assert(nameSet.contains("xl/worksheets/sheet1.xml") && nameSet.contains("[Content_Types].xml"))
      val sheet = new String(
        zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes, "UTF-8")
      assert(sheet.contains("product_file")) // header row
      // 3 layers + header
      assert("<row ".r.findAllIn(sheet).size == 4)
      assert(Fixtures.grdProducts.forall(p => sheet.contains(p.name)))
    } finally zf.close()
  }

  test("image-id txt export in band order (W2, metadata_crawler.py:243-252)") {
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    val path = tmpDir("ids") + "/image_ids.txt"
    cube.writeImageIdsTxt(path)
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    // all three products share the ICEYE id 54549; band order 1,0,2
    assert(txt == "54549,54549,54549")
  }

  test("GRD cube: metadata accessors with None fill") {
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    val md = cube.metadataByProduct(Fixtures.grdProducts.head.name)
    assert(md("satellite_look_angle") == "30")
    assert(md("orbit_direction") == "ASCENDING")
    assert(cube.getMetadata("nonexistent_key", 0) == "None")
    intercept[NoSuchElementException] { cube.productIndex("missing.tif") }
  }

  test("gap-filled cube: 33 bands, gap metadata None, dense NaN fill") {
    val cfg = CubeConfig.fromJsonString(
      """{"start_date": 20210426, "end_date": 20210528, "temporal_resolution": 1}""")
    val cube = Cube.fromDirectory(spark, grdDir, cfg)
    assert(cube.dimensions("Band") == 33L)
    // sparse pixels only hold the 3 real layers
    assert(cube.pixels.select("band_index").distinct().count() == 3)
    assert(cube.getMetadata("product_file", 0) == "None")
    assert(cube.getMetadata("product_file", 1).endsWith("fake_1.tif"))
    // dense export materializes NaN gaps (float dtype rule)
    val dense = cube.densePixels
    assert(dense.count() == 33L * 10 * 10)
    val gapVals = dense.filter(col("band_index") === 0).select("intensity")
      .collect().map(_.getDouble(0))
    assert(gapVals.length == 100 && gapVals.forall(_.isNaN))
  }

  test("SLC cube: complex variables and derived amplitude/intensity/phase") {
    val cube = Cube.fromDirectory(spark, slcDir, CubeConfig())
    assert(cube.dataVariables == Seq("real", "imag"))
    assert(cube.dimensions == Map("Band" -> 3L, "Azimuth" -> 20L, "Range" -> 20L))
    val withAll = cube.withAmplitude.withIntensity.withPhase
    val r = withAll.pixels.filter(col("azimuth") === 1 && col("range") === 2)
      .filter(col("band_index") === 1) // fake_0 (idx 0) sorted to band 1
      .select("real", "imag", "amplitude", "intensity", "phase").collect().head
    val v = Fixtures.pixelValue(0, 1, 2)
    assert(r.getDouble(0) == v && r.getDouble(1) == -v)
    assert(math.abs(r.getDouble(2) - math.sqrt(2 * v * v)) < 1e-9)
    assert(r.getDouble(3) == 2 * v * v)
    assert(math.abs(r.getDouble(4) - math.atan2(-v, v)) < 1e-12)
  }

  test("SLC shape mismatch is a hard error; GRD is tolerant (S4 vs S3)") {
    val badDir = tmpDir("badslc")
    val bad = Fixtures.slcProducts.map {
      case p if p.name.contains("fake_2") => p.copy(az = 10, rg = 10)
      case p => p
    }
    Fixtures.writeStack(spark, badDir, bad, slc = true)
    intercept[IllegalStateException] { Cube.fromDirectory(spark, badDir, CubeConfig()) }

    val badGrd = tmpDir("badgrd")
    val badG = Fixtures.grdProducts.map {
      case p if p.name.contains("fake_2") => p.copy(az = 5, rg = 5)
      case p => p
    }
    Fixtures.writeStack(spark, badGrd, badG, slc = false)
    assert(Cube.fromDirectory(spark, badGrd, CubeConfig()).dimensions("Band") == 3L)
  }

  test("mixed product extensions raise (generate_cube.py:53-72)") {
    val mixDir = tmpDir("mix")
    Fixtures.writeStack(spark, mixDir, Fixtures.grdProducts.take(1), slc = false)
    Fixtures.writeStack(spark, mixDir, Fixtures.slcProducts.take(1), slc = true)
    intercept[IllegalArgumentException] { Cube.fromDirectory(spark, mixDir, CubeConfig()) }
  }

  test("parquet roundtrip preserves dims, attrs, values (W1/S12)") {
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    val out = tmpDir("cubeout")
    CubeWriter.write(cube, out)
    val back = CubeReader.load(spark, out)
    assert(back.attrs == cube.attrs)
    assert(back.dimensions == cube.dimensions)
    val vals = back.productValues(Fixtures.grdProducts.head.name)
      .orderBy("azimuth", "range").select("intensity").collect().map(_.getDouble(0))
    assert(vals.head == Fixtures.pixelValue(0, 0, 0))
    assert(vals.length == 100)
  }
}
