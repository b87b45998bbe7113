package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {
  import spark.implicits._

  test("binary asset pipeline: schema, deterministic stub decode, feature sampling") {
    val docs = Seq((1L, "hello world payload"), (2L, "x" * 200)).toDF("doc_id", "text")
    val assets = Multimodal.asBinaryAssets(docs, "doc_id", "text")
    assert(assets.schema("payload").dataType.typeName == "binary")

    val decoded = Multimodal.decodeStub(assets)
    assert(decoded.schema == Multimodal.decodedSchema)
    val r = decoded.filter(col("doc_id") === 1).collect().head
    assert(r.getAs[Int]("n_bytes") == 19)
    assert(r.getAs[Int]("width") == 20 && r.getAs[Int]("height") == 1)
    assert(r.getAs[collection.Seq[Double]]("features").length == 8)
    // determinism: same input → same features
    val again = Multimodal.decodeStub(assets).filter(col("doc_id") === 1).collect().head
    assert(again.getAs[collection.Seq[Double]]("features") == r.getAs[collection.Seq[Double]]("features"))

    val sampled = Multimodal.sampleFeatures(decoded, 2)
    assert(sampled.filter(col("doc_id") === 1).collect().head
      .getAs[collection.Seq[Double]]("features").length == 4)
  }

  test("real ImageIO decode recovers exact dimensions, channels and channel means") {
    val ids = Seq(0L, 7L, 255L, 1000L)
    val assets = Multimodal.pngAssets(ids.toDF("doc_id"))
    val rows = Multimodal.decodeImage(assets).collect().map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val r = rows(id)
      val w = (id % 13 + 4).toInt
      val h = (id % 11 + 4).toInt
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == 3)
      // closed-form channel means from the generation rule
      val feats = r.getAs[collection.Seq[Double]]("features")
      (0 until 3).foreach { c =>
        var s = 0L
        for (y <- 0 until h; x <- 0 until w) s += (id * 7 + c * 31 + x + y) % 256
        assert(feats(c) == ((1000000L * s) / (w.toLong * h * 255L)).toDouble,
          s"doc $id channel $c")
      }
    }
  }

  test("undecodable payload degrades to stub features with null dimensions") {
    val assets = Seq((9L, "not a png at all")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeImage(
      Multimodal.asBinaryAssets(assets, "doc_id", "text")).collect().head
    assert(decoded.isNullAt(decoded.fieldIndex("width")))
    assert(decoded.getAs[collection.Seq[Double]]("features").length == 8)
  }

  test("recognized-but-corrupt payload (truncated PNG) degrades, not fails") {
    // a REAL png prefix so the PNG reader claims the stream, truncated
    // mid-data so ImageIO.read throws — the contract is a flagged row
    val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val full = baos.toByteArray
    val truncated = java.util.Arrays.copyOf(full, full.length / 2)
    val rows = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(7L, truncated, "image/png")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("media_type", org.apache.spark.sql.types.StringType))))
    val decoded = Multimodal.decodeImage(rows).collect().head
    assert(decoded.isNullAt(decoded.fieldIndex("width")),
      "corrupt payload must degrade to the stub row")
    assert(decoded.getAs[Int]("n_bytes") == truncated.length)
  }

  test("imagePhash is invariant under lossless re-encoding (PNG vs BMP)") {
    // The property that makes a PERCEPTUAL hash a dedup signal where
    // byte-md5 is not: two different losslessly-encoded files of the
    // same picture must share the fingerprint.
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("media_type", org.apache.spark.sql.types.StringType)))
    def reEncode(png: Array[Byte], fmt: String): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val ids = Seq(5L, 123L, 4077L)
    val rows = ids.flatMap { id =>
      val png = Multimodal.pngPayload(id)
      Seq(org.apache.spark.sql.Row(id, png, "image/png"),
        org.apache.spark.sql.Row(id + 100000L, reEncode(png, "bmp"), "image/bmp"))
    }
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = Multimodal.imagePhash(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- ids) {
      assert(got.contains(id) && got.contains(id + 100000L))
      assert(got(id) == got(id + 100000L),
        s"doc $id: PNG phash ${got(id)} != BMP re-encode phash ${got(id + 100000L)}")
      // the raw bytes DO differ — md5-style identity would miss the dup
      assert(!java.util.Arrays.equals(Multimodal.pngPayload(id),
        reEncode(Multimodal.pngPayload(id), "bmp")))
    }
  }

  test("audioFingerprint: silent windows never set bits; empty payloads drop") {
    import spark.implicits._
    val docs = Seq(3L, 44L, 1000L).toDF("doc_id")
    val fp = Multimodal.audioFingerprint(Multimodal.pcmAssets(docs), 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp.size == 3)
    for ((id, h) <- fp) {
      // windows 0, 3, 6 are silent by the payload rule — their energy is
      // 0, which can never exceed the positive mean
      assert((h & ((1L << 0) | (1L << 3) | (1L << 6))) == 0L,
        s"doc $id: silent-window bit set in $h")
      assert(h != 0L, s"doc $id: active windows must set at least one bit")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(9L, Array.emptyByteArray))), schema)
    assert(Multimodal.audioFingerprint(empty, 256).count() == 0L)
  }

  test("PCM16 VAD roundtrip: every third window silent, energies match a direct recompute") {
    import spark.implicits._
    val docs = Seq(3L, 44L, 1000L).toDF("doc_id")
    val rows = Multimodal.decodePcmWindows(Multimodal.pcmAssets(docs), 256)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows.size == 3 * 8) // 2048 samples / 256-sample windows
    for (((id, win), (n, energy, active)) <- rows) {
      assert(n == 256L)
      // recompute from the closed-form rule the payload encodes
      val want = (win * 256 until win * 256 + 256).map { i =>
        val v = if ((i / 256) % 3 == 0) 0L else ((id * 31 + i * 7) % 4096) - 2048
        v * v
      }.sum
      assert(energy == want, s"doc $id window $win: byte-parse energy $energy != $want")
      assert(active == (energy > 0))
      if (win % 3 == 0) assert(!active, s"window $win must be silent")
    }
  }
}
