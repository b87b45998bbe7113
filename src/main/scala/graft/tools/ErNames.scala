package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaled customer-name table for the entity-resolution spill audit
  * (SCALING.md, r14 verdict #6): `er_fuzzy_name_join`'s exchanges are
  * the SymSpell key explode (×|name|+1), the key equi-join, and the
  * candidate distinct — their mass is driven by the NAME count and the
  * deletion-key bucket shape, not by the documents corpus, so the Zipf
  * corpus family can't stress them. This tool writes an out dir whose
  * `customer.parquet` carries N TPC-H-convention names
  * (`Customer#%09d`, the same shape the fixtures use — sequential ids
  * make digit-substitution neighbors REAL, so the verify stage does
  * non-trivial work), with every other table hard-copied from the
  * source dir so BenchProbe's warmup and store prebuilds resolve.
  * Deterministic: names are a pure function of the row index.
  *
  * Usage: runMain graft.tools.ErNames <srcSfDir> <outDir> <nNames>
  */
object ErNames {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val n = args(2).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.util.SparkUtil.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outP = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(outP)
    // reference tables: copy everything except customer
    val srcP = java.nio.file.Paths.get(src)
    java.nio.file.Files.list(srcP).forEach { p =>
      val name = p.getFileName.toString
      if (name != "customer.parquet") {
        val dst = outP.resolve(name)
        if (!java.nio.file.Files.exists(dst)) {
          if (java.nio.file.Files.isDirectory(p)) {
            java.nio.file.Files.walk(p).forEach { q =>
              val rel = srcP.relativize(q)
              val d = outP.resolve(rel)
              if (java.nio.file.Files.isDirectory(q))
                java.nio.file.Files.createDirectories(d)
              else java.nio.file.Files.copy(q, d)
            }
          } else java.nio.file.Files.copy(p, dst)
        }
      }
    }
    // the source customer schema, with c_custkey/c_name regenerated at
    // scale and every other column cycled from the source rows (the ER
    // query touches only c_name; the rest keep the schema honest)
    val srcCust = spark.read.parquet(s"$src/customer.parquet")
    val otherCols = srcCust.columns.filterNot(c => c == "c_custkey" || c == "c_name")
    val srcSmall = srcCust.select((col("c_custkey") % 1000).as("mod_key") +:
      otherCols.map(col): _*).dropDuplicates("mod_key")
    spark.range(n)
      .select(col("id").as("c_custkey"),
        format_string("Customer#%09d", col("id")).as("c_name"),
        (col("id") % 1000).as("mod_key"))
      .join(broadcast(srcSmall), "mod_key")
      .drop("mod_key")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    println(s"ER names: $n rows at $out/customer.parquet")
    spark.stop()
  }
}
