package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.Cube
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Cube persistence (W1/S12 deviation documented in SURVEY §7.3):
  * Parquet instead of netCDF —
  *
  * ```
  * dir/layers/        layers table (parquet)
  * dir/pixels/        pixel table, partitioned by band_index
  * dir/_attrs.json    cube attrs
  * ```
  *
  * partitionBy(band_index) makes per-product point queries (Q7) prune to
  * one band's files; at 100 TB each band is still written by all tasks in
  * parallel.
  */
object CubeWriter {
  def write(cube: Cube, dir: String): Unit = {
    cube.layers.write.mode("overwrite").parquet(s"$dir/layers")
    cube.pixels.write.mode("overwrite").partitionBy("band_index").parquet(s"$dir/pixels")
    val json = new ObjectMapper().writeValueAsString(cube.attrs.asJava)
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/_attrs.json"), json.getBytes(StandardCharsets.UTF_8))
  }
}

object CubeReader {
  def load(spark: SparkSession, dir: String): Cube = {
    val layers = spark.read.parquet(s"$dir/layers")
    val pixels = spark.read.parquet(s"$dir/pixels")
      .withColumn("band_index", col("band_index").cast("int"))
    val attrs = new ObjectMapper()
      .readValue(new java.io.File(s"$dir/_attrs.json"), classOf[java.util.Map[String, String]])
      .asScala.toMap
    Cube(layers, pixels, attrs)
  }
}
