package graft.labels

import graft.{Fixtures, SparkFunSuite}
import graft.core.{Cube, CubeConfig}
import graft.GenerateCube
import org.apache.spark.sql.functions._

/** Labels goldens ported from tests/vector_labels_datacube_test.py,
  * raster_labels_datacube_test.py, datacube_test.py:130-188 and
  * merge_datacubes_test.py. */
class LabelsSpec extends SparkFunSuite {
  import spark.implicits._

  lazy val grdDir: String = Fixtures.writeGrdStack(spark, tmpDir("grdlab"))

  def writeVectorLabels(products: Seq[String]): String = {
    val cl = new CreateLabels("vector")
    products.foreach { pf =>
      cl.populateLabels(pf, Seq(cl.instanceBbox("rand-b", 2, 5, 9, 7)))
      cl.populateLabels(pf, cl.instanceClassification(Seq("tag1", "tag2")))
    }
    val path = tmpDir("labels") + "/vector_labels.json"
    cl.writeLabelsToJson(path)
    path
  }

  def writeMasks(dir: String, products: Seq[String]): String = {
    val cl = new CreateLabels("raster")
    products.zipWithIndex.foreach { case (pf, i) =>
      val maskPath = s"$dir/mask_$i.parquet"
      (for { a <- 0 until 10; r <- 0 until 10 } yield (a, r, (i + 1).toDouble))
        .toDF("azimuth", "range", "label").coalesce(1).write.mode("overwrite").parquet(maskPath)
      cl.populateLabels(pf, maskPath)
    }
    val path = s"$dir/mask_labels.json"
    cl.writeLabelsToJson(path)
    path
  }

  test("CreateLabels: vector appends, raster refuses duplicate masks (W3)") {
    val cl = new CreateLabels("vector")
    cl.populateLabels("a.tif", Seq(cl.instanceBbox("x", 0, 0, 1, 1)))
    cl.populateLabels("a.tif", cl.instancePoint("y", 1, 2))
    assert(cl.toJson.contains("\"bbox\"") && cl.toJson.contains("\"point\""))
    val cr = new CreateLabels("raster")
    cr.populateLabels("a.tif", "m.parquet")
    intercept[IllegalArgumentException] { cr.populateLabels("a.tif", "m2.parquet") }
    intercept[IllegalArgumentException] { new CreateLabels("bogus") }
  }

  test("vector labels cube: objects land on labelled layers, [] for labelled-empty, null for unlabelled") {
    val labelled = Fixtures.grdProducts.take(2).map(_.name)
    val path = writeVectorLabels(labelled)
    val cube = LabelsCubeBuilder.build(spark, grdDir, path, CubeConfig())
    assert(cube.attrs("product_type") == "VECTOR_LABELS")
    val rows = cube.layers.orderBy("band_index")
      .select("product_file", "objects_json").collect()
    assert(rows.length == 3)
    // fake_2 is unlabelled → F6 NaN-out: product_file nulled, objects null
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.filter(!_.isNullAt(0)).forall(_.getString(1).contains("rand-b")))
  }

  test("vector labels roundtrip through the facade merge (datacube_test.py:130-188)") {
    val labelled = Fixtures.grdProducts.map(_.name)
    val path = writeVectorLabels(labelled)
    val merged = GenerateCube.createCube(spark, grdDir, CubeConfig(), Some(path))
    // SAR variables intact
    assert(merged.dataVariables == Seq("intensity"))
    assert(merged.dimensions == Map("Band" -> 3L, "Azimuth" -> 10L, "Range" -> 10L))
    // labels column present on layers, parseable back to objects (M13 JSON
    // replaces pickle)
    val objs = merged.layers.filter(col("product_file").endsWith("fake_0.tif"))
      .select(explode(expr(
        """from_json(objects_json, 'ARRAY<STRUCT<class: STRING,
          |bbox: STRUCT<xmin: INT, ymin: INT, xmax: INT, ymax: INT>,
          |classification: ARRAY<STRING>>>')""".stripMargin)).as("o"))
      .select("o.class", "o.bbox.xmin", "o.classification")
      .collect()
    assert(objs.length == 2)
    assert(objs.exists(r => r.getAs[String]("class") == "rand-b" && r.getAs[Int]("xmin") == 2))
    assert(objs.exists(r => Option(r.getSeq[String](2)).exists(_ == Seq("tag1", "tag2"))))
  }

  test("raster labels cube: mask pixels tagged per band, merge adds label variable") {
    val maskDir = tmpDir("masks")
    val labelled = Fixtures.grdProducts.take(2).map(_.name)
    val path = writeMasks(maskDir, labelled)
    val cube = LabelsCubeBuilder.build(spark, grdDir, path, CubeConfig())
    assert(cube.dataVariables == Seq("label"))
    assert(cube.pixels.count() == 200) // 2 labelled products × 100 px
    val merged = GenerateCube.createCube(spark, grdDir, CubeConfig(), Some(path))
    assert(merged.dataVariables.toSet == Set("intensity", "label"))
    // fake_0 (source idx 0, mask value 1.0) sits at band 1 after date sort
    val r = merged.pixels.filter(col("band_index") === 1 && col("azimuth") === 3 && col("range") === 4)
      .select("intensity", "label").collect().head
    assert(r.getDouble(0) == Fixtures.pixelValue(0, 3, 4))
    assert(r.getDouble(1) == 1.0)
    // unlabelled band: intensity present, label null
    val u = merged.pixels.filter(col("band_index") === 2 && col("azimuth") === 0 && col("range") === 0)
      .select("intensity", "label").collect().head
    assert(u.getDouble(0) == Fixtures.pixelValue(2, 0, 0))
    assert(u.isNullAt(1))
  }

  test("raster labels from real PNG masks (S9, raster_labels.py:83-98)") {
    val maskDir = tmpDir("pngmasks")
    val labelled = Fixtures.grdProducts.take(2).map(_.name)
    val cl = new CreateLabels("raster")
    labelled.zipWithIndex.foreach { case (pf, i) =>
      val maskPath = s"$maskDir/mask_$i.png"
      Fixtures.writePngMask(maskPath, i, 10, 10)
      cl.populateLabels(pf, maskPath)
    }
    val path = s"$maskDir/mask_labels.json"
    cl.writeLabelsToJson(path)

    val cube = LabelsCubeBuilder.build(spark, grdDir, path, CubeConfig())
    assert(cube.dataVariables == Seq("label"))
    assert(cube.pixels.count() == 200)
    // pixel-exact per product: fake_0 (mask idx 0) lands at band 1 (date
    // sort 1,0,2); fake_1 (mask idx 1) at band 0
    Seq((0, 1), (1, 0)).foreach { case (maskIdx, band) =>
      val vals = cube.pixels.filter(col("band_index") === band)
        .orderBy("azimuth", "range").select("label").collect().map(_.getDouble(0))
      val expected = for { a <- 0 until 10; r <- 0 until 10 }
        yield Fixtures.maskValue(maskIdx, a, r).toDouble
      assert(vals.toSeq == expected, s"mask $maskIdx at band $band")
    }
  }

  test("labels over a resampled cube: gaps stay None, labelled bands keep objects") {
    val cfg = graft.core.CubeConfig.fromJsonString(
      """{"start_date": 20210426, "end_date": 20210528, "temporal_resolution": 1}""")
    val path = writeVectorLabels(Fixtures.grdProducts.map(_.name))
    val merged = GenerateCube.createCube(spark, grdDir, cfg, Some(path))
    assert(merged.dimensions("Band") == 33L)
    val labelled = merged.layers.filter(col("objects_json").isNotNull)
      .select("band_index").collect().map(_.getInt(0)).sorted
    assert(labelled.toSeq == Seq(1, 2, 31)) // real layers only
    assert(merged.getMetadata("product_file", 0) == "None")
  }

  test("mixed raster+vector labels raise (labels_utils.py:34-44)") {
    val dir = tmpDir("mixedlabels")
    val json =
      """[{"product_file": "a.tif", "labels": {"objects": []}},
        | {"product_file": "b.tif", "labels": {"segmentation": "m.parquet"}}]""".stripMargin
    val path = s"$dir/labels.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), json.getBytes("UTF-8"))
    intercept[IllegalArgumentException] { LabelsCubeBuilder.readLabels(path) }
  }

  test("unknown labels format raises") {
    val dir = tmpDir("badlabels")
    val json = """[{"product_file": "a.tif", "labels": {"wat": []}}]"""
    val path = s"$dir/labels.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), json.getBytes("UTF-8"))
    intercept[IllegalArgumentException] { LabelsCubeBuilder.readLabels(path) }
  }
}
