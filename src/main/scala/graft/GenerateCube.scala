package graft

import graft.core.{Cube, CubeConfig}
import graft.io.CubeWriter
import graft.labels.LabelsCubeBuilder
import graft.util.SparkUtil
import org.apache.spark.sql.SparkSession

/** The `create_cube` facade + CLI (icecube/bin/generate_cube.py:41-91,
  * 214-229): config parse → product-type dispatch → SAR cube → optional
  * labels cube → merge → optional write.
  */
object GenerateCube {

  def createCube(
      spark: SparkSession,
      rasterDir: String,
      config: CubeConfig,
      labelsFpath: Option[String] = None): Cube = {
    val sar = Cube.fromDirectory(spark, rasterDir, config)
    labelsFpath match {
      case None => sar
      case Some(lp) =>
        val labels = LabelsCubeBuilder.build(spark, rasterDir, lp, config)
        sar.merge(labels)
    }
  }

  /** CLI: --raster-dir D --config C [--labels L] [--out O] */
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val rasterDir = opts.getOrElse("--raster-dir", sys.error("--raster-dir is required"))
    val configPath = opts.get("--config").orNull
    val spark = SparkUtil.local("graft-generate-cube")
    try {
      val cube = createCube(spark, rasterDir, CubeConfig.fromJsonFile(configPath), opts.get("--labels"))
      opts.get("--out") match {
        case Some(out) =>
          CubeWriter.write(cube, out)
          println(s"cube written to $out (bands=${cube.dimensions("Band")})")
        case None =>
          println(s"cube built: dims=${cube.dimensions}")
      }
    } finally spark.stop()
  }
}
