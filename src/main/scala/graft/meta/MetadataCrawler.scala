package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Directory scan → layers (metadata) DataFrame.
  *
  * Port of the reference metadata crawler semantics
  * (icecube/utils/metadata_crawler.py:20-65,138-229,255-267) over the
  * binary-decode-free fixture layout (FIXTURES.md §2): each product is a
  * `<product_file>.json` metadata object next to a `<product_file>.parquet`
  * pixel table.
  *
  * All projection/fallback logic is columnar (`coalesce` chains) so the
  * whole crawl is one distributed JSON scan — no per-file driver loop.
  */
object MetadataCrawler {

  /** The 10 supported variables (sar_datacube_metadata.py:28-39), with
    * `extent` carried as WKT and an extra open-attrs map. */
  val SupportedVariables: Seq[String] = Seq(
    "product_file", "product_fpath", "incidence_center", "look_side",
    "orbit_direction", "extent", "acquisition_date", "acquisition_time",
    "number_of_azimuth_samples", "number_of_range_samples")

  private val CoreJsonFields = Set(
    "product_file", "incidence_center", "local_incidence_angle",
    "incidence_near", "incidence_far", "look_side", "orbit_direction",
    "acquisition_end_utc", "number_of_azimuth_samples", "number_of_range_samples",
    "coord_first_near", "coord_first_far", "coord_last_near", "coord_last_far")

  def crawlDirectory(spark: SparkSession, dir: String): DataFrame = {
    val files = listMetadataFiles(dir)
    require(files.nonEmpty, s"Could not find any products in $dir")
    crawlFiles(spark, files)
  }

  def listMetadataFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".json"))
      .map(_.getAbsolutePath).sorted.toSeq
  }

  /** Build from an explicit file list; validates existence and homogeneous
    * product extension (compute_metdatadf_from_list,
    * sar_datacube_metadata.py:83-108). */
  def crawlFiles(spark: SparkSession, metadataPaths: Seq[String]): DataFrame = {
    require(metadataPaths != null && metadataPaths.nonEmpty,
      s"Please provide a correct input - $metadataPaths")
    metadataPaths.foreach { p =>
      require(new java.io.File(p).isFile, s"File $p isn't a correct path")
    }
    val exts = metadataPaths.map(productExtension).distinct
    require(exts.size == 1,
      s"All files should have the same extensions, found: ${exts.mkString(", ")}")

    val raw = spark.read.option("multiLine", value = true).json(metadataPaths: _*)
      .withColumn("_src", input_file_name())
    project(raw)
  }

  /** "ICEYE_GRD_x_fake_0.tif.json" → ".tif" */
  private def productExtension(metaPath: String): String = {
    val stem = new java.io.File(metaPath).getName.stripSuffix(".json")
    stem.lastIndexOf('.') match {
      case -1 => ""
      case i  => stem.substring(i)
    }
  }

  private def optCol(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null)

  /** (lat, lon) pair at positions 3,4 of a coord vector, reversed to
    * (lon, lat) — metadata_crawler.py:255-267 takes coord[2:] and [::-1].
    * Built with `concat` (NOT concat_ws) so a missing coordinate makes the
    * corner — and thus the whole extent — null, matching the reference's
    * extent=NaN on any missing corner; concat_ws would silently skip the
    * null and emit malformed WKT that Geo.parseWktPolygon throws on. */
  private def lonLat(df: DataFrame, name: String): Column =
    concat(
      element_at(optCol(df, name).cast(ArrayType(DoubleType)), 4).cast(StringType),
      lit(" "),
      element_at(optCol(df, name).cast(ArrayType(DoubleType)), 3).cast(StringType))

  private def project(raw: DataFrame): DataFrame = {
    val acqTs = to_timestamp(optCol(raw, "acquisition_end_utc"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

    // incidence fallback chain (metadata_crawler.py:214-229): middle element
    // of local_incidence_angle (python round = half-even → bround), else
    // incidence_center, else mean(near, far).
    val lia = optCol(raw, "local_incidence_angle").cast(ArrayType(DoubleType))
    val incidence = coalesce(
      element_at(lia, (bround(size(lia) / 2.0) + 1).cast("int")),
      optCol(raw, "incidence_center").cast(DoubleType),
      (optCol(raw, "incidence_near").cast(DoubleType) + optCol(raw, "incidence_far").cast(DoubleType)) / 2.0)

    // extent polygon [bl, br, ur, ul, bl] (metadata_crawler.py:255-267);
    // concat propagates null, so ANY missing corner nulls the extent.
    val extent =
      concat(lit("POLYGON(("),
        lonLat(raw, "coord_last_near"), lit(", "),
        lonLat(raw, "coord_last_far"), lit(", "),
        lonLat(raw, "coord_first_far"), lit(", "),
        lonLat(raw, "coord_first_near"), lit(", "),
        lonLat(raw, "coord_last_near"), lit("))"))

    // open attrs: every non-core JSON field, stringified (NumpyEncoder
    // analog, common_utils.py:126-138 — arrays/structs become JSON text).
    val extraFields = raw.columns.filterNot(c => CoreJsonFields.contains(c) || c == "_src").sorted
    val attrEntries = extraFields.flatMap { f =>
      val v = raw.schema(f).dataType match {
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f))
        case _                                         => col(f).cast(StringType)
      }
      Seq(lit(f), v)
    }
    val attrs = if (attrEntries.isEmpty) map() else map_filter(map(attrEntries: _*), (_, v) => v.isNotNull)

    raw.select(
      coalesce(optCol(raw, "product_file"),
        regexp_extract(col("_src"), "([^/]+)\\.json$", 1)).as("product_file"),
      // raster-path analog: "<dir>/<product_file>" (strip the .json and
      // the file: URI prefix); the pixel payload lives next to it as
      // <product_fpath>.<ext> for any registered CubeSource extension
      regexp_replace(regexp_replace(col("_src"), "\\.json$", ""), "^file:/+", "/")
        .as("product_fpath"),
      incidence.as("incidence_center"),
      optCol(raw, "look_side").cast(StringType).as("look_side"),
      optCol(raw, "orbit_direction").cast(StringType).as("orbit_direction"),
      extent.as("extent"),
      date_format(acqTs, "yyyyMMdd").as("acquisition_date"),
      date_format(acqTs, "HHmmss.SSSSSS").as("acquisition_time"),
      optCol(raw, "number_of_azimuth_samples").cast(IntegerType).as("number_of_azimuth_samples"),
      optCol(raw, "number_of_range_samples").cast(IntegerType).as("number_of_range_samples"),
      attrs.as("metadata"),
    )
  }
}
