package graft.core

import graft.meta.{CubePlanner, MetadataCrawler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A datacube: two DataFrames plus cube-level attrs.
  *
  * Replaces the reference's `xr.Dataset` (icecube/bin/datacube.py:20-28):
  *   - `layers`  — 1 row per band: band_index, band_time, the 10 supported
  *     metadata variables (SURVEY §1.3) and the open attrs map;
  *   - `pixels`  — long format: band_index, azimuth, range, one column per
  *     data variable (intensity | real+imag | label), nullable;
  *   - `attrs`   — cube-level attributes (product_type, dtype, dims).
  *
  * Layers stay tiny (one row per image — driver-safe to collect); pixels
  * are never collected, only transformed/written. Point queries filter on
  * `band_index`, which the parquet layout partitions by, so per-product
  * reads prune to one band's files.
  */
final case class Cube(
    layers: DataFrame,
    pixels: DataFrame,
    attrs: Map[String, String],
) {
  import Cube._

  /** Q1: data variable names (datacube.py:41-45). */
  def dataVariables: Seq[String] =
    pixels.columns.filterNot(Seq("band_index", "band_time", "azimuth", "range").contains).toSeq

  /** Q2: dimension sizes (datacube.py:62-67). */
  def dimensions: Map[String, Long] = Map(
    "Band" -> layers.count(),
    "Azimuth" -> attrs.get("master_azimuth").map(_.toLong).getOrElse(
      pixels.agg(max(col("azimuth"))).first() match { case r if r.isNullAt(0) => 0L; case r => r.getInt(0) + 1L }),
    "Range" -> attrs.get("master_range").map(_.toLong).getOrElse(
      pixels.agg(max(col("range"))).first() match { case r if r.isNullAt(0) => 0L; case r => r.getInt(0) + 1L }),
  )

  /** Q3: cube attrs (datacube.py:69-74). */
  def cubeMetadata: Map[String, String] = attrs

  /** Q4: ordered product list; error when all gaps (datacube.py:84-97). */
  def allProducts: Seq[String] = {
    val products = layers.orderBy("band_index")
      .select(coalesce(col("product_file"), lit(NoneValue)))
      .collect().map(_.getString(0)).toSeq
    if (products.forall(_ == NoneValue)) {
      throw new NoSuchElementException("product files metadata is missing from the cube")
    }
    products
  }

  /** Q5: band index of a product (datacube.py:99-119). */
  def productIndex(productFile: String): Int = {
    val rows = layers.filter(col("product_file") === productFile)
      .select(col("band_index")).limit(1).collect()
    if (rows.isEmpty) {
      throw new NoSuchElementException(s"product_file: $productFile is missing from cube metadata")
    }
    rows.head.getInt(0)
  }

  /** Q6/Q8: per-product metadata with "None" fill for missing keys
    * (datacube.py:121-136; "None" padding sar_datacube.py:171-186). */
  def metadataByProduct(productFile: String): Map[String, String] = {
    val idx = productIndex(productFile)
    metadataByIndex(idx)
  }

  def metadataByIndex(bandIndex: Int): Map[String, String] = {
    val row = layers.filter(col("band_index") === bandIndex).collect().headOption
      .getOrElse(throw new NoSuchElementException(s"no layer at band index $bandIndex"))
    val core = MetadataCrawler.SupportedVariables.map { v =>
      val i = row.fieldIndex(v)
      v -> (if (row.isNullAt(i)) NoneValue else String.valueOf(row.get(i)))
    }.toMap
    val open = row.getAs[Map[String, String]]("metadata") match {
      case null => Map.empty[String, String]
      case m    => m
    }
    core ++ open
  }

  /** Q8 single-key variant with "None" for gaps (sar_datacube.py:209-242). */
  def getMetadata(key: String, bandIndex: Int): String =
    metadataByIndex(bandIndex).getOrElse(key, NoneValue)

  /** Q7: one band's pixel plane by product (datacube.py:138-158). */
  def productValues(productFile: String): DataFrame =
    bandValues(productIndex(productFile))

  /** Q7: one band's pixel plane by index (datacube.py:160-175).
    * band_index filter prunes to a single parquet partition on read. */
  def bandValues(bandIndex: Int): DataFrame =
    pixels.filter(col("band_index") === bandIndex)
      .select(("azimuth" +: "range" +: dataVariables).map(col): _*)

  /** M1-M3 derived variables for complex (SLC) cubes
    * (analytics_IO.py:189-216, slc_datacube.py:221-255). */
  def withAmplitude: Cube = derived("amplitude", sqrt(col("real") * col("real") + col("imag") * col("imag")))
  def withIntensity: Cube = derived("intensity", col("real") * col("real") + col("imag") * col("imag"))
  def withPhase: Cube = derived("phase", atan2(col("imag"), col("real")))

  private def derived(name: String, c: org.apache.spark.sql.Column): Cube = {
    require(pixels.columns.contains("real") && pixels.columns.contains("imag"),
      s"$name requires complex (real/imag) pixel data")
    copy(pixels = pixels.withColumn(name, c))
  }

  /** J4: merge two cubes sharing the band/azimuth/range grid
    * (datacube.py:177-201, combine_attrs="drop_conflicts").
    *
    * Pixels: when both sides carry pixel data the join is a full outer on
    * the (band_index, azimuth, range) coordinates — variable union like
    * `xr.Dataset.merge`. Layers: joined on band_index, open-attrs maps
    * merged with drop-conflict semantics.
    */
  def merge(other: Cube): Cube = {
    val coords = Seq("band_index", "azimuth", "range")
    val mergedPixels =
      if (other.pixels.isEmpty) pixels
      else if (pixels.isEmpty) other.pixels
      else {
        val dupVars = other.dataVariables.toSet.intersect(dataVariables.toSet)
        val rightKeep = other.pixels.columns.filter(c => coords.contains(c) || !dupVars.contains(c))
        val joined = pixels.drop("band_time")
          .join(other.pixels.select(rightKeep.map(col).toSeq: _*).drop("band_time"), coords, "full_outer")
        // Re-attach band_time (dropped pre-join since both sides carry
        // it): keeps the merged pixel schema identical to the unmerged
        // branches — TiledPixels.tile / CubeWriter.writeTiled group by
        // band_time and would otherwise fail on a merged cube. The lookup
        // unions BOTH cubes' layers so a band present only in `other`
        // still gets its time (full-outer pixels can carry such rows).
        // Broadcast join against the layer-cardinality table is
        // shuffle-free.
        if (pixels.columns.contains("band_time")) {
          val bandTimes = layers.select(col("band_index"), col("band_time"))
            .unionByName(other.layers.select(col("band_index"), col("band_time")))
            .groupBy("band_index").agg(first(col("band_time"), ignoreNulls = true).as("band_time"))
          joined.join(broadcast(bandTimes), Seq("band_index"), "left")
        } else joined
      }
    val rightLayerCols = Seq("band_index", "metadata") ++
      other.layers.columns.filter(c => !layers.columns.contains(c))
    val mergedLayers = layers
      .join(other.layers.select(rightLayerCols.distinct.map(col): _*)
        .withColumnRenamed("metadata", "_other_metadata"), Seq("band_index"), "left")
      .withColumn("metadata", mergeAttrMaps(col("metadata"), col("_other_metadata")))
      .drop("_other_metadata")
    // drop_conflicts at cube level: keep keys that agree or exist once
    val mergedAttrs = (attrs.keySet ++ other.attrs.keySet).flatMap { k =>
      (attrs.get(k), other.attrs.get(k)) match {
        case (Some(a), Some(b)) if a == b => Some(k -> a)
        case (Some(a), None)              => Some(k -> a)
        case (None, Some(b))              => Some(k -> b)
        case _                            => None
      }
    }.toMap
    Cube(mergedLayers, mergedPixels, mergedAttrs)
  }

  /** Q9: ML tile/batch extraction (docs/examples/Ex5 surface): bucket the
    * pixel grid into tileSize² tiles and collect each tile's values as an
    * array ordered by (azimuth, range). One shuffle on the tile key; tile
    * payloads (~tileSize² × 8 bytes) are the reference chunk analog. */
  def tiles(tileSize: Int): DataFrame = {
    val firstVar = dataVariables.head
    pixels
      .withColumn("tile_az", (col("azimuth") / tileSize).cast("int"))
      .withColumn("tile_rg", (col("range") / tileSize).cast("int"))
      .groupBy(col("band_index"), col("tile_az"), col("tile_rg"))
      .agg(sort_array(collect_list(struct(col("azimuth"), col("range"), col(firstVar))))
        .getField(firstVar).as("values"))
  }

  /** W2: metadata table export as CSV (metadata_crawler.py:232-252).
    * Maps/arrays are stringified first (CSV writer limitation). */
  def writeMetadataCsv(dir: String): Unit = {
    val flat = layers.withColumn("metadata", to_json(col("metadata")))
    flat.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
  }

  /** W2: metadata table export as XLSX (save_metadata_table_as_excel_table,
    * metadata_crawler.py:232-235) via the dependency-free [[graft.io.Xlsx]]
    * writer. Driver-side: the table is layer-cardinality, as in the
    * reference's pandas `to_excel`. */
  def writeMetadataExcel(path: String): Unit = {
    val flat = layers.withColumn("metadata", to_json(col("metadata")))
    val header = flat.columns.toSeq
    val rows = flat.orderBy("band_index").collect().toSeq.map(r =>
      header.indices.map(i => Option(r.get(i)).map(String.valueOf).orNull))
    graft.io.Xlsx.write(path, header, rows)
  }

  /** W2: image-id txt export (save_image_ids_as_txt,
    * metadata_crawler.py:243-252): one comma-separated line of image
    * numbers in band order. The id comes from the `image_number` open
    * attr when present, else the numeric field of the ICEYE product name
    * (ICEYE_GRD_<image_number>_…). Layer-cardinality — a driver-side
    * write, like the reference. */
  def writeImageIdsTxt(path: String): Unit = {
    val ids = layers.filter(col("product_file").isNotNull && col("product_file") =!= "None")
      .orderBy("band_index")
      // regexp_extract returns "" (not null) on no match — nullif it so
      // non-ICEYE names fall through to the full product_file instead of
      // emitting a blank id
      .select(coalesce(
        element_at(col("metadata"), "image_number"),
        nullif(regexp_extract(col("product_file"), "^ICEYE_[A-Z]+_(\\d+)_", 1), lit("")),
        col("product_file")))
      .collect().map(_.getString(0))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      ids.mkString(",").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** W1 interop: export this cube in the reference's own netCDF4 format
    * (to_file, datacube.py:203-212) — readable by xarray and by
    * [[Cube.fromNetcdf]]. Band-streamed write; parquet ([[graft.io.CubeStore]])
    * remains the native distributed sink. */
  def toNetcdf(path: String): Unit = graft.io.NetcdfWriter.write(this, path)

  /** Dense export: materialize gap pixels for every layer on the master
    * grid (M12 dummy layers, grd_datacube.py:93-111). Gap values follow
    * the reference rule (tests/grd_datacube_test.py:108-122): float dtype
    * ⇒ NaN, int dtype ⇒ 0; stored sparse as null until this call.
    */
  def densePixels: DataFrame = {
    val az = dimensions("Azimuth")
    val rg = dimensions("Range")
    val spark = pixels.sparkSession
    val grid = spark.range(az).select(col("id").cast("int").as("azimuth"))
      .crossJoin(spark.range(rg).select(col("id").cast("int").as("range")))
    val bands = broadcast(layers.select(col("band_index"), col("band_time")))
    val full = bands.crossJoin(grid)
    val isInt = attrs.get("dtype").exists(d => d.startsWith("int") || d.startsWith("uint"))
    val fills = dataVariables.map { v =>
      val c = col(v)
      val filled = if (isInt) coalesce(c, lit(0)) else coalesce(c, lit(Double.NaN))
      filled.as(v)
    }
    full.join(pixels.drop("band_time"), Seq("band_index", "azimuth", "range"), "left")
      .select(col("band_index") +: col("band_time") +: col("azimuth") +: col("range") +: fills: _*)
  }
}

object Cube {
  /** Reference encodes missing metadata as the string "None"
    * (sar_datacube.py:171-186). */
  val NoneValue = "None"

  /** Build from a fixture-layout directory (§3.1 facade path):
    * sniff product type, crawl metadata, run the planner, attach pixels.
    */
  def fromDirectory(spark: SparkSession, dir: String, config: CubeConfig): Cube =
    graft.io.CubeBuilder.fromDirectory(spark, dir, config)

  def fromFiles(spark: SparkSession, metadataPaths: Seq[String], config: CubeConfig): Cube =
    graft.io.CubeBuilder.fromFiles(spark, metadataPaths, config)

  /** S12/W1: parquet cube persistence. */
  def load(spark: SparkSession, dir: String): Cube = graft.io.CubeReader.load(spark, dir)

  /** S12 interop: read a reference-written netCDF4 cube
    * (datacube.py:203-212 output; read-back datacube.py:30-39). */
  def fromNetcdf(spark: SparkSession, path: String): Cube =
    graft.io.Netcdf.readCube(spark, path)

  private[graft] def mergeAttrMaps(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // drop_conflicts: key in both with different value → dropped
    val both = map_filter(map_zip_with(coalesce(a, map()), coalesce(b, map()),
      (_, v1, v2) => coalesce(
        when(v1.isNotNull && v2.isNotNull && v1 === v2, v1),
        when(v1.isNotNull && v2.isNull, v1),
        when(v1.isNull && v2.isNotNull, v2))),
      (_, v) => v.isNotNull)
    when(a.isNull && b.isNull, lit(null)).otherwise(both)
  }
}
