package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tiled pixel representation (SURVEY §7.4 risk 1 / §7.5).
  *
  * Long format is the canonical processing layout, but at 100 TB a
  * 10k×10k image is 10⁸ rows per band — row overhead dominates. The tiled
  * layout packs each tileSize² block into one row (the analog of the
  * reference's dask chunks, datacube_variables.py:27): ~3 orders of
  * magnitude fewer rows, arrays stored contiguously in parquet, and
  * per-tile pruning for window reads (Q9-style ML batching reads only the
  * tiles intersecting the requested window).
  *
  * Sparse-safe: each tile stores its pixels as (azimuth, range, value…)
  * structs sorted by position, so gap pixels simply don't appear and
  * [[untile]] is an exact inverse. Long-format remains a lazy view —
  * `posexplode` back on demand.
  */
object TiledPixels {

  private val coordCols = Set("band_index", "band_time", "azimuth", "range")

  /** Long → tiled. One shuffle on (band, tile) keys. */
  def tile(pixels: DataFrame, tileSize: Int): DataFrame = {
    val valueCols = pixels.columns.filterNot(coordCols.contains)
    val cell = struct((Seq("azimuth", "range") ++ valueCols).map(col): _*)
    pixels
      .withColumn("tile_az", (col("azimuth") / tileSize).cast("int"))
      .withColumn("tile_rg", (col("range") / tileSize).cast("int"))
      .groupBy(col("band_index"), col("band_time"), col("tile_az"), col("tile_rg"))
      .agg(sort_array(collect_list(cell)).as("cells"))
      .withColumn("tile_size", lit(tileSize))
  }

  /** Tiled → long (exact inverse of [[tile]]). */
  def untile(tiled: DataFrame): DataFrame = {
    val cellSchema = tiled.schema("cells").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val valueCols = cellSchema.fieldNames.filterNot(Set("azimuth", "range").contains)
    tiled
      .select(col("band_index"), col("band_time"), explode(col("cells")).as("c"))
      .select(Seq(col("band_index"), col("band_time"),
        col("c.azimuth").as("azimuth"), col("c.range").as("range")) ++
        valueCols.map(v => col(s"c.$v").as(v)): _*)
  }

  /** Window read with tile pruning: only tiles intersecting the
    * [az0,az1]×[rg0,rg1] window are opened (the filter on tile_az/tile_rg
    * pushes to the parquet scan), then pixels are trimmed exactly. */
  def window(tiled: DataFrame, tileSize: Int, az0: Int, az1: Int, rg0: Int, rg1: Int): DataFrame =
    untile(tiled.filter(
      col("tile_az").between(az0 / tileSize, az1 / tileSize) &&
        col("tile_rg").between(rg0 / tileSize, rg1 / tileSize)))
      .filter(col("azimuth").between(az0, az1) && col("range").between(rg0, rg1))
}
