package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: isolate ws_tokens vs the builtin split chain. */
object TokScratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.SparkUtil.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.util.Tables.documents(spark, d).filter(col("text").isNotNull)

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"SCRATCH $name%-40s $best%7.3f s")
    }

    val oldToks = split(trim(lower(col("text"))), "\\s+")
    val newToks = graft.functions.WsTokens.ws_tokens(col("text"))
    time("explode(split) count")(
      docs.select(explode(oldToks).as("w")).groupBy().count())
    time("explode(ws_tokens) count")(
      docs.select(explode(newToks).as("w")).groupBy().count())
    locally {
      import graft.operators.SignatureStore
      val stored = SignatureStore.ensureBpeMerges(spark, d).orderBy("rank").collect()
      val merges = stored.map(r => s"${r.getString(1)} ${r.getString(2)}").toSeq
      def encode(toks: org.apache.spark.sql.Column) =
        docs.select(col("doc_id"), explode(toks).as("word"))
          .filter(col("word") =!= "")
          .withColumn("syms", graft.functions.BpeMerge.bpe_apply_merges(
            concat(expr("regexp_extract_all(word, '.', 0)"), array(lit("</w>"))),
            typedLit(merges)))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum(size(col("syms")).cast("long")).as("bpe_tokens"))
          .orderBy("doc_id")
      time("encode(split) full")(encode(oldToks))
      time("encode(ws_tokens) full")(encode(newToks))
    }
    def gopherish(toks: org.apache.spark.sql.Column) =
      docs.withColumn("tk", toks)
        .withColumn("n_tokens", size(col("tk")).cast("long"))
        .filter(col("n_tokens") >= 10)
        .filter(lit(5L) * graft.operators.TextQueries.maxBigramRun(col("tk"))
          <= (size(col("tk")) - 1).cast("long"))
        .groupBy().agg(sum("n_tokens"))
    time("gopherish(split)")(gopherish(oldToks))
    time("gopherish(ws_tokens)")(gopherish(newToks))
    time("simhash(split)")(
      docs.select(graft.functions.SimhashSig.simhash_sig(oldToks).as("s"))
        .groupBy().agg(sum(expr("s % 1000000"))))
    time("simhash(ws_tokens)")(
      docs.select(graft.functions.SimhashSig.simhash_sig(newToks).as("s"))
        .groupBy().agg(sum(expr("s % 1000000"))))
    time("size-only(split)")(
      docs.select(size(oldToks).cast("long").as("n")).groupBy().sum("n"))
    time("size-only(ws_token_count)")(
      docs.select(graft.functions.WsTokenCount.ws_token_count(col("text"))
        .cast("long").as("n")).groupBy().sum("n"))
    time("explode(split) regexp_chars")(
      docs.select(explode(oldToks).as("w"))
        .filter(col("w") =!= "")
        .select(expr("size(regexp_extract_all(w, '.', 0))").as("n"))
        .groupBy().sum("n"))
    time("explode(ws_tokens) regexp_chars")(
      docs.select(explode(newToks).as("w"))
        .filter(col("w") =!= "")
        .select(expr("size(regexp_extract_all(w, '.', 0))").as("n"))
        .groupBy().sum("n"))
    spark.stop()
  }
}
