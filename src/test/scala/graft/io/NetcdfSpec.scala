package graft.io

import graft.{Fixtures, SparkFunSuite}
import graft.core.Cube
import org.apache.spark.sql.functions._

/** netCDF4 cube interop (S12): the fixture reproduces the exact layout
  * family xarray's `to_netcdf` writes for an icecube cube — HDF5
  * container, dimension-scale coordinate datasets (CLASS attr), CF time
  * units on the Band axis, rank-3 data variables with dict-of-lists
  * layer attrs, global attrs on the root group. */
class NetcdfSpec extends SparkFunSuite {

  private val az = 6
  private val rg = 5
  private val names = Fixtures.grdProducts.map(_.name)

  lazy val ncPath: String = {
    val dir = tmpDir("nc")
    val path = s"$dir/cube.nc"
    val n = 3 * az * rg
    val intensity = Array.tabulate(n) { i =>
      val b = i / (az * rg); val a = (i % (az * rg)) / rg; val r = i % rg
      Fixtures.pixelValue(b, a, r).toFloat
    }
    Fixtures.writeH5(path,
      Seq(
        "Band" -> Fixtures.H5I64(Seq(3), Array(1L, 0L, 30L)),
        "Azimuth" -> Fixtures.H5I64(Seq(az), Array.tabulate(az)(_.toLong)),
        "Range" -> Fixtures.H5I64(Seq(rg), Array.tabulate(rg)(_.toLong)),
        "Intensity" -> Fixtures.H5F32(Seq(3, az, rg), intensity)),
      attrs = Map(
        "Band" -> Seq(
          "CLASS" -> Fixtures.H5Str("DIMENSION_SCALE"),
          "units" -> Fixtures.H5Str("days since 2021-04-27 00:00:00"),
          "calendar" -> Fixtures.H5Str("proleptic_gregorian")),
        "Azimuth" -> Seq("CLASS" -> Fixtures.H5Str("DIMENSION_SCALE")),
        "Range" -> Seq("CLASS" -> Fixtures.H5Str("DIMENSION_SCALE")),
        "Intensity" -> Seq(
          "product_file" -> Fixtures.H5StrArr(names),
          "orbit_direction" -> Fixtures.H5StrArr(Seq("DESCENDING", "ASCENDING", "ASCENDING")),
          "incidence_center" -> Fixtures.H5StrArr(Seq("29.5", "30.5", "28.5")),
          "satellite_look_angle" -> Fixtures.H5StrArr(Seq("29", "30", "28")))),
      rootAttrs = Seq(
        "product_type" -> Fixtures.H5Str("GRD"),
        "dtype" -> Fixtures.H5Str("float32"),
        // netCDF-C bookkeeping — must NOT leak into cube metadata
        "_NCProperties" -> Fixtures.H5Str("version=2,netcdf=4.9.2,hdf5=1.12.2")))
    path
  }

  test("CF time units: zone designators and offsets fold into the UTC epoch") {
    val (base, perDay) = Netcdf.cfUnits("days since 2021-04-27 00:00:00")
    assert(perDay == 86400e6)
    // UTC/GMT/Z suffixes are identities
    assert(Netcdf.cfUnits("days since 2021-04-27 00:00:00 UTC")._1 == base)
    assert(Netcdf.cfUnits("days since 2021-04-27T00:00:00Z")._1 == base)
    assert(Netcdf.cfUnits("seconds since 2021-04-27 00:00:00 GMT")._1 == base)
    // a +02:00 producer offset shifts the epoch two hours EARLIER in UTC
    assert(Netcdf.cfUnits("hours since 2021-04-27 00:00:00 +02:00")._1 ==
      base - 2L * 3600 * 1000000)
    assert(Netcdf.cfUnits("hours since 2021-04-27 00:00:00 -0330")._1 ==
      base + (3L * 3600 + 30 * 60) * 1000000)
    // date-only base (CDO style)
    assert(Netcdf.cfUnits("days since 2021-04-27")._1 == base)
  }

  test("netCDF cube load: dims, CF band times, cube attrs") {
    val cube = Cube.fromNetcdf(spark, ncPath)
    assert(cube.dimensions == Map("Band" -> 3L, "Azimuth" -> az.toLong, "Range" -> rg.toLong))
    assert(cube.attrs("product_type") == "GRD" && cube.attrs("dtype") == "float32")
    assert(!cube.attrs.contains("_NCProperties"),
      "library bookkeeping attrs must not become cube metadata")
    assert(cube.dataVariables == Seq("intensity"))

    // CF decode: days [1, 0, 30] since 2021-04-27 → UTC midnights
    val times = cube.layers.orderBy("band_index").select("band_time")
      .collect().map(_.getTimestamp(0).toInstant.toString)
    assert(times.toSeq == Seq("2021-04-28T00:00:00Z", "2021-04-27T00:00:00Z", "2021-05-27T00:00:00Z"))
  }

  test("netCDF cube pixels are layer-major exact") {
    val cube = Cube.fromNetcdf(spark, ncPath)
    (0 until 3).foreach { b =>
      val vals = cube.pixels.filter(col("band_index") === b)
        .orderBy("azimuth", "range").select("intensity").collect().map(_.getDouble(0))
      assert(vals.length == az * rg)
      val ok = vals.zipWithIndex.forall { case (v, i) =>
        v == Fixtures.pixelValue(b, i / rg, i % rg).toFloat.toDouble
      }
      assert(ok, s"band $b pixel mismatch")
    }
  }

  test("toNetcdf → fromNetcdf roundtrip on a built cube (W1 interop sink)") {
    import graft.core.CubeConfig
    val grdDir = Fixtures.writeGrdStack(spark, tmpDir("ncrt"))
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    val path = s"${tmpDir("ncout")}/cube.nc"
    cube.toNetcdf(path)

    val back = Cube.fromNetcdf(spark, path)
    assert(back.dimensions == cube.dimensions)
    assert(back.dataVariables == Seq("intensity"))
    assert(back.attrs("product_type") == "GRD")

    // band order and times preserved
    val t1 = cube.layers.orderBy("band_index").select("band_time")
      .collect().map(_.getTimestamp(0).toInstant)
    val t2 = back.layers.orderBy("band_index").select("band_time")
      .collect().map(_.getTimestamp(0).toInstant)
    assert(t1.toSeq == t2.toSeq)

    // pixel-exact per band (float64 payload — lossless for these values)
    val orig = cube.pixels.select("band_index", "azimuth", "range", "intensity")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    val rt = back.pixels.select("band_index", "azimuth", "range", "intensity")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(rt == orig && orig.size == 300)

    // layer metadata (core + open attrs) survives the dict-of-lists encode
    val name0 = Fixtures.grdProducts.head.name
    val m = back.metadataByProduct(name0)
    assert(m("orbit_direction") == "ASCENDING")
    assert(m("incidence_center") == "30.5")
    assert(m("satellite_look_angle") == "30")
    assert(back.productIndex(name0) == cube.productIndex(name0))
  }

  test("netCDF export size guard steers oversized cubes to the parquet store") {
    import graft.core.CubeConfig
    val grdDir = Fixtures.writeGrdStack(spark, tmpDir("ncguard"))
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    try {
      // the fixture cube is ~2.4 KB of planes; a 1-byte budget trips it
      spark.conf.set("spark.graft.netcdf.maxExportGb", (1.0 / (1L << 30)).toString)
      val e = intercept[IllegalArgumentException] {
        cube.toNetcdf(s"${tmpDir("ncguardout")}/cube.nc")
      }
      assert(e.getMessage.contains("CubeStore"), e.getMessage)
      assert(e.getMessage.contains("maxExportGb"), e.getMessage)
    } finally spark.conf.unset("spark.graft.netcdf.maxExportGb")
    // default budget (8 GiB) passes the fixture cube untouched
    val ok = s"${tmpDir("ncguardok")}/cube.nc"
    cube.toNetcdf(ok)
    assert(Cube.fromNetcdf(spark, ok).dimensions == cube.dimensions)
  }

  test("netCDF dict-of-lists variable attrs become per-layer metadata") {
    val cube = Cube.fromNetcdf(spark, ncPath)
    val m0 = cube.metadataByProduct(names(0))
    assert(m0("orbit_direction") == "DESCENDING")
    assert(m0("incidence_center") == "29.5")
    assert(m0("satellite_look_angle") == "29")
    val m2 = cube.metadataByProduct(names(2))
    assert(m2("orbit_direction") == "ASCENDING" && m2("satellite_look_angle") == "28")
    // accessor API works over the imported cube
    assert(cube.allProducts == names)
    assert(cube.productIndex(names(1)) == 1)
  }

  test("golden netCDF-4 conventions file (independent byte generator) imports exactly") {
    // The checked-in golden (tools/make_netcdf_golden.py, stdlib-only,
    // written from the PUBLIC HDF5/netCDF-4 specs — shares no code with
    // graft's reader or writer) carries the full convention surface a
    // netcdf4-python/xarray writer produces and the Scala fixture writer
    // does not: DIMENSION_LIST vlen-of-object-reference attrs (backed by
    // a real global heap), REFERENCE_LIST compound attrs, the phantom-
    // dimension NAME string, _FillValue, and _NCProperties. The reader
    // must skip the bookkeeping gracefully and decode everything else.
    val url = getClass.getResource("/golden/netcdf4_conventions.nc")
    assert(url != null, "golden resource missing")
    val cube = Netcdf.readCube(spark, new java.io.File(url.toURI).getAbsolutePath)

    assert(cube.attrs("master_azimuth") == "3" && cube.attrs("master_range") == "4")
    assert(cube.attrs("title") == "graft golden cube")
    assert(!cube.attrs.contains("_NCProperties"), "library provenance must not leak")

    val px = cube.pixels.collect()
    assert(px.length == 24)
    val byKey = px.map(r => ((r.getInt(0), r.getInt(2), r.getInt(3)), r)).toMap
    // intensity = b*100 + a*10 + r, NaN planted at (1,2,3) → null
    assert(byKey((0, 0, 0)).getDouble(4) == 0.0)
    assert(byKey((1, 2, 2)).getDouble(4) == 122.0)
    assert(byKey((0, 1, 3)).getDouble(4) == 13.0)
    assert(byKey((1, 2, 3)).isNullAt(4), "fill NaN must import as null")

    // CF band times: days since 2020-01-01 → [0, 5]
    val times = cube.layers.orderBy("band_index")
      .select("band_time").collect().map(_.getTimestamp(0).toInstant.toString)
    assert(times.toSeq == Seq("2020-01-01T00:00:00Z", "2020-01-06T00:00:00Z"))

    // per-layer metadata from the dict-of-lists variable attrs
    val layers = cube.layers.orderBy("band_index")
      .select("look_side", "incidence_center").collect()
    assert(layers.map(_.getString(0)).toSeq == Seq("LEFT", "RIGHT"))
    assert(layers.map(_.getDouble(1)).toSeq == Seq(21.5, 30.25))
  }
}
