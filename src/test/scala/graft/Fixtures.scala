package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generates the binary-decode-free equivalents of the reference test
  * fixtures (FIXTURES.md §2): golden metadata from
  * tests/grd_datacube_test.py:20-39 / tests/slc_datacube_test.py:24-40,
  * deterministic pixel values `idx*1000 + azimuth*10 + range`.
  */
object Fixtures {

  case class Product(
      name: String,
      acquisitionEndUtc: String,
      orbitDirection: String,
      incidenceCenter: Double,
      satelliteLookAngle: String,
      az: Int,
      rg: Int)

  val grdProducts: Seq[Product] = Seq(
    Product("ICEYE_GRD_54549_20210427T215124_hollow_10x10pixels_fake_0.tif",
      "2021-04-28T21:51:30.025535", "ASCENDING", 30.5, "30", 10, 10),
    Product("ICEYE_GRD_54549_20210427T215124_hollow_10x10pixels_fake_1.tif",
      "2021-04-27T21:51:30.025535", "DESCENDING", 29.5, "29", 10, 10),
    Product("ICEYE_GRD_54549_20210427T215124_hollow_10x10pixels_fake_2.tif",
      "2021-05-27T21:51:30.025535", "ASCENDING", 28.5, "28", 10, 10),
  )

  val slcProducts: Seq[Product] = Seq(
    Product("ICEYE_SLC_54549_20210427T215124_hollow_20x20pixels_fake_0.h5",
      "2021-04-28T21:51:30.025535", "ASCENDING", 30.5, "30", 20, 20),
    Product("ICEYE_SLC_54549_20210427T215124_hollow_20x20pixels_fake_1.h5",
      "2021-04-27T21:51:30.025535", "DESCENDING", 29.5, "29", 20, 20),
    Product("ICEYE_SLC_54549_20210427T215124_hollow_20x20pixels_fake_2.h5",
      "2021-05-27T21:51:30.025535", "ASCENDING", 28.5, "28", 20, 20),
  )

  def pixelValue(idx: Int, az: Int, rg: Int): Double = idx * 1000.0 + az * 10.0 + rg

  def metadataJson(p: Product): String =
    s"""{
       |  "product_file": "${p.name}",
       |  "acquisition_end_utc": "${p.acquisitionEndUtc}",
       |  "orbit_direction": "${p.orbitDirection}",
       |  "incidence_center": ${p.incidenceCenter},
       |  "look_side": "RIGHT",
       |  "satellite_look_angle": "${p.satelliteLookAngle}",
       |  "number_of_azimuth_samples": ${p.az},
       |  "number_of_range_samples": ${p.rg},
       |  "coord_first_near": [0, 0, 47.0, 21.0],
       |  "coord_first_far":  [0, 0, 47.0, 21.1],
       |  "coord_last_near":  [0, 0, 47.1, 21.0],
       |  "coord_last_far":   [0, 0, 47.1, 21.1]
       |}""".stripMargin

  /** Write a GRD or SLC stack into `dir`; returns the dir. */
  def writeStack(spark: SparkSession, dir: String, products: Seq[Product], slc: Boolean,
      format: String = "parquet"): String = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    products.zipWithIndex.foreach { case (p, idx) =>
      Files.write(Paths.get(s"$dir/${p.name}.json"),
        metadataJson(p).getBytes(StandardCharsets.UTF_8))
      val rows = for { a <- 0 until p.az; r <- 0 until p.rg } yield (a, r, pixelValue(idx, a, r))
      val df: DataFrame =
        if (slc) rows.map { case (a, r, v) => (a, r, v, -v) }.toDF("azimuth", "range", "real", "imag")
        else rows.toDF("azimuth", "range", "intensity")
      val w = df.coalesce(1).write.mode("overwrite")
      if (format == "csv") w.option("header", "true").csv(s"$dir/${p.name}.csv")
      else w.parquet(s"$dir/${p.name}.parquet")
    }
    dir
  }

  def writeGrdStack(spark: SparkSession, dir: String): String =
    writeStack(spark, dir, grdProducts, slc = false)

  def writeSlcStack(spark: SparkSession, dir: String): String =
    writeStack(spark, dir, slcProducts, slc = true)
}
