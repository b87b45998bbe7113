package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-domain registries:
  *   - [[operators.RelationalQueries]] — SURVEY §2 relational inventory
  */
object SparkEntry {

  private def registry: Map[String, QueryDef] =
    operators.RelationalQueries.defs ++
      operators.TextQueries.defs ++
      operators.BpeQueries.defs ++
      operators.UnigramQueries.defs ++
      operators.VectorQueries.defs ++
      operators.PqQueries.defs ++
      operators.RerankQueries.defs ++
      operators.DriftQueries.defs ++
      operators.SketchQueries.defs ++
      operators.GraphQueries.defs ++
      operators.LayoutQueries.defs ++
      operators.CurationQueries.defs ++
      operators.SearchQueries.defs ++
      operators.Multimodal.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The cube-planner pipeline shape: filter → dedup → calendar gap-fill.
    */
  def entry(spark: SparkSession): DataFrame =
    registry("a3_resample_gapfill").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, v) => k -> v.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
