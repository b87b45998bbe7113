package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the custom-operator layer needs:
  * wrapping a hand-built [[LogicalPlan]] back into a [[DataFrame]].
  * Spark deliberately keeps `Dataset.ofRows` package-private, and the
  * standard extension-library technique (GraphFrames, Sedona, Delta all
  * do the same) is a single bridge object inside the `sql` package.
  * Nothing else in this repo lives outside the `graft` namespace.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
