package graft.tools

import org.apache.spark.sql.SparkSession

/** Clustered planted-pair embedding corpus for the bitext-mining scale
  * curve (SCALING.md): the driver's synthetic embeddings are ISOTROPIC
  * Gaussians, on which no ANN structure exists — any shortlist that
  * keeps recall must probe a constant FRACTION of cells, so the IVF
  * twin's candidate mass stays near-quadratic (measured; see the
  * `mine_bitext_margin_ann` doc comment). Real bitext corpora are the
  * opposite regime (Artetxe & Schwenk, ACL 2019: multilingual sentence
  * embeddings cluster by topic, and a sentence and its translation
  * nearly coincide), and that is the case margin-based mining — and
  * IVF — exist for. This tool synthesizes that geometry:
  *
  *   - ceil(√N) unit TOPIC centers (seeded Gaussians, deterministic);
  *   - pair p: x = unit(center_topic(p) + 0.5·g), its planted
  *     translation y = unit(x + 0.25·g') — cos(x,y) ≈ 0.97, far above
  *     the in-topic background (≈0.8) and cross-topic noise (≈0);
  *   - vec_id 2p carries even label (the x side of the miner's
  *     `label % 2` split), 2p+1 odd — every vector is a pure function
  *     of its id (splitmix seeding), so regeneration is deterministic;
  *   - documents + aux tables are copied from a source SF dir so store
  *     prebuilds and warmup probes resolve.
  *
  * Usage: runMain graft.tools.BitextCorpus <srcSfDir> <outDir> <nVec>
  */
object BitextCorpus {
  final val Dim = 64

  private def rngFor(id: Long, salt: Long): scala.util.Random = {
    var z = id * 0x9E3779B97F4A7C15L + salt
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    new scala.util.Random(z ^ (z >>> 31))
  }

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def gauss(rng: scala.util.Random): Array[Double] =
    Array.fill(Dim)(rng.nextGaussian())

  private def center(topic: Long): Array[Double] =
    unit(gauss(rngFor(topic, 0xCE27E4L)))

  /** Perturb a unit vector by Gaussian noise of TOTAL norm ≈ `s` (a
    * raw N(0,1) vector has norm √Dim, so per-coordinate scale is
    * s/√Dim — scaling by s directly would swamp the signal 8× at
    * Dim=64). cos(v, v+noise) ≈ 1/√(1+s²). */
  private def jitter(v: Array[Double], s: Double,
      rng: scala.util.Random): Array[Double] = {
    val k = s / math.sqrt(Dim.toDouble)
    unit(v.zip(gauss(rng)).map { case (c, g) => c + k * g })
  }

  /** The embedding of vec_id — pure. Even ids are x-side draws around
    * their pair's topic center (norm-0.75 jitter: in-topic cos ≈ 0.8);
    * odd ids are the planted translation of the preceding even id
    * (norm-0.25 jitter: pair cos ≈ 0.97). */
  def embedding(vecId: Long, nTopics: Long): Array[Float] = {
    val p = vecId / 2
    val x = jitter(center(p % nTopics), 0.75, rngFor(p, 0xB17E1L))
    val v =
      if (vecId % 2 == 0) x
      else jitter(x, 0.25, rngFor(p, 0x7A15L))
    v.map(_.toFloat)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val nVec = args(2).toLong
    val spark = graft.util.SparkUtil.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nTopics = math.ceil(math.sqrt(nVec.toDouble)).toLong
    spark.range(nVec).map { id =>
      // label parity selects the miner's side; the quotient spreads
      // labels like the fixture corpus so class-keyed queries group
      (id, embedding(id, nTopics), (id % 2 + 2 * ((id / 2) % 4)).toInt)
    }.toDF("vec_id", "embedding", "label")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents")) {
      val from = new org.apache.hadoop.fs.Path(s"$src/$t.parquet")
      val to = new org.apache.hadoop.fs.Path(s"$out/$t.parquet")
      if (fs.exists(from) && !fs.exists(to))
        org.apache.hadoop.fs.FileUtil.copy(fs, from, fs, to, false,
          spark.sparkContext.hadoopConfiguration)
    }
    println(s"bitext corpus $out: " +
      spark.read.parquet(s"$out/embeddings.parquet").count() +
      s" vectors, $nTopics topics")
    spark.stop()
  }
}
