package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class ParsersSpec extends SparkFunSuite {
  import spark.implicits._

  test("M4: GRD key normalization keeps orbit-state camelCase") {
    assert(Parsers.correctGrdMetadataKey("ORBIT_DIRECTION") == "orbit_direction")
    assert(Parsers.correctGrdMetadataKey("POSX") == "posX")
    assert(Parsers.correctGrdMetadataKey("VELZ") == "velZ")
    val df = Seq(Map("POSX" -> "1", "LOOK_SIDE" -> "RIGHT")).toDF("m")
    val out = df.select(Parsers.normalizeGrdKeys($"m").as("m")).collect().head
      .getAs[Map[String, String]]("m")
    assert(out == Map("posX" -> "1", "look_side" -> "RIGHT"))
  }

  test("M8: float vector parse with bracket validation") {
    val df = Seq("[1.0 2.5, 3]", "nope", "[[1.0]]").toDF("s")
    val out = df.select(Parsers.parseFloatVector($"s").as("v")).collect()
    assert(out(0).getAs[collection.Seq[Double]]("v") == Seq(1.0, 2.5, 3.0))
    assert(out(1).isNullAt(0)) // no brackets → reference aborts → null
    assert(out(2).isNullAt(0)) // nested → null
  }

  test("M9: datetime vector parse") {
    val df = Seq("['2021-01-01','2021-01-02']").toDF("s")
    val out = df.select(Parsers.parseDatetimeVector($"s").as("v")).collect().head
    assert(out.getAs[collection.Seq[String]]("v") == Seq("2021-01-01", "2021-01-02"))
  }

  test("S10: KML coordinates parse") {
    val kml = """<kml><Placemark><Polygon><coordinates>
                |  21.0,47.0,0 21.1,47.0 21.1,47.1,5.5
                |</coordinates></Polygon></Placemark></kml>""".stripMargin
    val pts = Parsers.parseKmlCoordinates(kml)
    assert(pts == Seq((21.0, 47.0, 0.0), (21.1, 47.0, 0.0), (21.1, 47.1, 5.5)))
    intercept[IllegalArgumentException] { Parsers.parseKmlCoordinates("<kml></kml>") }
  }

  test("dtype override casts pixel values and is whitelisted") {
    val dir = graft.Fixtures.writeGrdStack(spark, tmpDir("dtypegrd"))
    val cube = graft.io.CubeBuilder.fromDirectory(
      spark, dir, graft.core.CubeConfig(), Some("int16"))
    assert(cube.attrs("dtype") == "int16")
    assert(cube.pixels.schema("intensity").dataType.typeName == "short")
    intercept[IllegalArgumentException] {
      graft.io.CubeBuilder.fromDirectory(spark, dir, graft.core.CubeConfig(), Some("complex128"))
    }
  }

  test("Q9 tiles + W2 csv export on a GRD cube") {
    val dir = graft.Fixtures.writeGrdStack(spark, tmpDir("tilegrd"))
    val cube = graft.core.Cube.fromDirectory(spark, dir, graft.core.CubeConfig())
    val t = cube.tiles(5)
    // 10×10 grid, tile 5 ⇒ 4 tiles per band × 3 bands
    assert(t.count() == 12)
    val one = t.filter(col("band_index") === 1 && col("tile_az") === 0 && col("tile_rg") === 0)
      .collect().head.getAs[collection.Seq[Double]]("values")
    assert(one.length == 25)
    assert(one.head == graft.Fixtures.pixelValue(0, 0, 0)) // fake_0 at band 1
    val csvDir = tmpDir("csvout")
    cube.writeMetadataCsv(csvDir)
    val back = spark.read.option("header", "true").csv(csvDir)
    assert(back.count() == 3)
    assert(back.columns.contains("product_file"))
  }
}
