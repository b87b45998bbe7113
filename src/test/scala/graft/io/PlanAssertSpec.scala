package graft.io

import graft.{Fixtures, SparkFunSuite}
import graft.core.{Cube, CubeConfig}
import org.apache.spark.sql.functions._

/** Physical-plan assertions for the scale-critical paths: these are the
  * properties that keep the engine viable at 100 TB, so they are pinned
  * by test, not just by inspection.
  */
class PlanAssertSpec extends SparkFunSuite {

  lazy val storeDir: String = {
    val grdDir = Fixtures.writeGrdStack(spark, tmpDir("planassert"))
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    val dir = tmpDir("planstore")
    CubeWriter.write(cube, dir)
    dir
  }

  test("point query on a stored cube prunes band partitions and pushes pixel filters") {
    val cube = CubeReader.load(spark, storeDir)
    val q = cube.pixels
      .filter(col("band_index") === 1 && col("azimuth") === 3 && col("range") === 4)
    val plan = q.queryExecution.executedPlan.toString
    // band_index is a partition column: the scan must carry a partition
    // filter (only band_index=1 directories are read)…
    assert(plan.contains("PartitionFilters") && plan.contains("band_index"),
      s"expected band-partition pruning:\n$plan")
    // …and azimuth/range predicates must reach the parquet reader.
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(azimuth,3)"),
      s"expected pushed pixel filters:\n$plan")
    assert(q.count() == 1)
  }

  test("column pruning: a 2-column projection reads a 2-column schema") {
    val cube = CubeReader.load(spark, storeDir)
    val q = cube.pixels.select("azimuth", "intensity")
    val plan = q.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(readSchema.exists(s => s.contains("azimuth") && s.contains("intensity")
      && !s.contains("range")), s"expected pruned read schema, got $readSchema:\n$plan")
  }

  test("cube build band-tagging joins broadcast (pixels never shuffle)") {
    val grdDir = Fixtures.writeGrdStack(spark, tmpDir("planbuild"))
    val cube = Cube.fromDirectory(spark, grdDir, CubeConfig())
    val plan = cube.pixels.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"band tagging must broadcast the layer table:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"pixel-side sort-merge join would shuffle the pixel table:\n$plan")
  }

  test("whole-stage codegen covers the text-stats pipeline shape") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("token "), col("id").cast("string")).as("text"))
    val q = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens"),
      length(col("text")).as("n_chars"))
      .filter(col("n_tokens") > 0)
    // codegen stages print as "*(n)" in the simple plan string
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected a whole-stage-codegen stage:\n$plan")
  }
}
