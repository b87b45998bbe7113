package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration: a Spark build plus (optionally)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver
  * sorts columns by name and hash-compares values.
  *
  * Determinism rules applied throughout the registry:
  *   - every query ends in a total ORDER BY (unique tiebreak key) on both
  *     sides, so row order can never diverge;
  *   - double sums are computed over DECIMAL casts (exact, order-free) and
  *     cast back to double; libm-dependent scalars (atan2, cosine) are
  *     rounded so last-ulp differences between JVM and DuckDB vanish.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object QueryDef {
  def sql(oracleSql: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(oracleSql))
  def rowsOnly(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None)
}
