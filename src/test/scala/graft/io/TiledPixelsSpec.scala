package graft.io

import graft.{Fixtures, SparkFunSuite}
import graft.core.{Cube, CubeConfig}
import org.apache.spark.sql.functions._

class TiledPixelsSpec extends SparkFunSuite {

  lazy val cube: Cube = Cube.fromDirectory(
    spark, Fixtures.writeGrdStack(spark, tmpDir("tiled")), CubeConfig())

  test("tile → untile is an exact roundtrip") {
    val tiled = TiledPixels.tile(cube.pixels, 4)
    // 10×10 grid, tile 4 ⇒ 3×3 tiles per band × 3 bands
    assert(tiled.count() == 27)
    val back = TiledPixels.untile(tiled)
    assert(back.count() == cube.pixels.count())
    val orig = cube.pixels.select("band_index", "azimuth", "range", "intensity")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))).sorted
    val rt = back.select("band_index", "azimuth", "range", "intensity")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))).sorted
    assert(orig.toSeq == rt.toSeq)
  }

  test("tiled cube store roundtrip through CubeWriter/CubeReader") {
    val out = tmpDir("tiledstore")
    CubeWriter.writeTiled(cube, out, 4)
    val back = Cube.load(spark, out)
    assert(back.attrs("tile_size") == "4")
    assert(back.dimensions == cube.dimensions)
    assert(back.pixels.count() == cube.pixels.count())
    val v = back.productValues(Fixtures.grdProducts.head.name)
      .filter(col("azimuth") === 7 && col("range") === 2)
      .select("intensity").collect().head.getDouble(0)
    assert(v == Fixtures.pixelValue(0, 7, 2))
  }

  test("window read prunes tiles and trims exactly") {
    val tiled = TiledPixels.tile(cube.pixels, 4)
    val w = TiledPixels.window(tiled, 4, 2, 5, 3, 6)
    assert(w.count() == 3L * 4 * 4) // 3 bands × 4×4 window
    val vals = w.filter(col("band_index") === 1)
      .orderBy("azimuth", "range").select("azimuth", "range", "intensity")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(vals.head == ((2, 3, Fixtures.pixelValue(0, 2, 3)))) // fake_0 at band 1
    assert(vals.last == ((5, 6, Fixtures.pixelValue(0, 5, 6))))
  }
}
