package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S11: DEM GeoTIFF read (load_DEM, analytics_IO.py:268-277). A DEM is
  * just a single-band float raster — the [[Tiff]] codec decodes it; this
  * wrapper names the value column `height` and keeps the reference's
  * clear file-not-found error. */
object Dem {

  def load(spark: SparkSession, path: String): DataFrame = {
    if (!new java.io.File(path).isFile)
      throw new java.io.FileNotFoundException(s"No file named $path was found, aborting")
    TiffPixelSource.readPixels(spark, Seq(path))
      .withColumnRenamed("intensity", "height")
      .drop("_fpath")
  }

  /** DEM grid shape from the header only. */
  def shape(path: String): (Int, Int) = {
    val info = Tiff.readHeader(path)
    (info.height, info.width)
  }
}
