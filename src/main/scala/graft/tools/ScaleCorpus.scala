package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic corpus upsampler for scale-curve measurement
  * (SCALING.md): replicates the documents/embeddings tables of a source
  * SF directory `factor`× into a new directory, preserving the
  * WITHIN-replica duplicate structure while keeping replicas disjoint —
  * so candidate-pair counts, posting sizes and cluster populations grow
  * ~linearly with the factor, the way a real corpus grows (a naive
  * verbatim copy would make every doc a 10-way exact dup and blow the
  * pair count quadratically — measuring THAT curve would measure the
  * copy artifact, not the operator).
  *
  *   - `doc_id`/`vec_id` re-keyed per replica by a fixed stride (1e9 —
  *     far above any fixture id), so ids stay unique and joins behave;
  *   - each replica's text goes through a replica-distinct seeded
  *     ALPHABET PERMUTATION (a bijection on [a-z], [A-Z] and [0-9];
  *     replica 0 = identity): within-replica structure is preserved
  *     EXACTLY (a bijection on characters is an isomorphism on shingle
  *     sets — identical Jaccard, identical dup families, identical
  *     token lengths and df shape), while cross-replica CHARACTER
  *     5-grams are disjoint up to vanishing chance. (The r10 version
  *     used Caesar rotations, which cap at 26 distinct lowercase
  *     images — factors past 26 would alias replicas into exact
  *     cross-replica duplicates.)
  *     Both weaker transforms fail: appending a suffix token leaves
  *     minhash signatures identical (min-over-shingles is robust to
  *     additions) and merges replica LSH buckets; per-token suffixes
  *     leave the INTERNAL 5-grams of every word ≥5 chars shared, and
  *     with 2-hash bands the cross-replica collision mass still grows
  *     the pair count superlinearly (measured: ×613 pairs for ×10 docs
  *     — the copy artifact, not the operator);
  *   - embeddings are copied verbatim under new ids (timing-equivalent;
  *     ANN cost depends on cardinality, not coordinates);
  *   - every other table is referenced from the SOURCE directory via
  *     copied files, so probes that warm on q1_agg keep working.
  *
  * Usage: runMain graft.tools.ScaleCorpus <srcSfDir> <outDir> [factor]
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.util.SparkUtil.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stride = 1000000000L
    val reps = spark.range(factor).select(col("id").as("rep"))

    // per-replica SEEDED PERMUTATION of each character class (was a
    // Caesar rotation, which has only 26 distinct lowercase images —
    // replicas r and r+26 would share an alphabet and become exact
    // cross-replica duplicates, merging their LSH buckets; the 1000×
    // scale point needs factors ≫ 26). A seeded Fisher–Yates per
    // replica keeps every guarantee the rotation had (a bijection on
    // characters is an isomorphism on shingle sets: identical
    // within-replica Jaccard, dup families, token lengths, df shape)
    // while distinct permutations share cross-replica 5-grams only by
    // vanishing chance. Replica 0 is the identity so the source corpus
    // embeds verbatim.
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    val alphabet = lower + upper + digits
    def permuted(r: Int): String = {
      if (r == 0) return alphabet
      val rng = new scala.util.Random(0x5ca1ab1eL + r)
      def shuf(s: String) = rng.shuffle(s.toList).mkString
      shuf(lower) + shuf(upper) + shuf(digits)
    }

    val docs = spark.read.parquet(s"$src/documents.parquet")
    // batched unions: a factor-wide reduce builds a plan with `factor`
    // scans — fine at 10, pathological at 100+ — so replicas write in
    // groups of at most 16 scans, appending
    val groups = (0 until factor).grouped(16).toSeq
    groups.zipWithIndex.foreach { case (g, gi) =>
      g.map { r =>
        docs.withColumn("doc_id", col("doc_id") + lit(r.toLong * stride))
          .withColumn("text", translate(col("text"), alphabet, permuted(r)))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode(if (gi == 0) "overwrite" else "append")
        .parquet(s"$out/documents.parquet")
    }

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * stride)
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // reference tables copied as-is so warmup/auxiliary reads resolve
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      val from = new org.apache.hadoop.fs.Path(s"$src/$t.parquet")
      val to = new org.apache.hadoop.fs.Path(s"$out/$t.parquet")
      if (fs.exists(from) && !fs.exists(to))
        org.apache.hadoop.fs.FileUtil.copy(fs, from, fs, to, false,
          spark.sparkContext.hadoopConfiguration)
    }
    println(s"scaled $src -> $out x$factor: " +
      spark.read.parquet(s"$out/documents.parquet").count() + " docs, " +
      spark.read.parquet(s"$out/embeddings.parquet").count() + " vectors")
    spark.stop()
  }
}
