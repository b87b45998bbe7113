package graft.operators

import graft.QueryDef
import graft.util.Tables._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in distributed batches.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container — SURVEY brief): [[decodeStub]] derives deterministic fake
  * dimensions/features from the bytes. Everything Spark-side is real:
  * the schema contract, the `mapPartitions` batch execution (the Scala
  * analog of `mapInPandas` — one iterator per partition, streaming, no
  * per-row JVM boundary), and the partitioning (payloads are hash-
  * distributed by key so decode parallelism = partition count, and wide
  * binary columns never shuffle after decode).
  */
object Multimodal {

  /** Decoded-asset schema: what a real image decode would produce. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("features", ArrayType(FloatType)),
  ))

  /** Wrap a table as a binary-asset table (payload = opaque bytes). */
  def asBinaryAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"),
      lit("image/fake").as("media_type"))

  /** ======= DECODE STUB =======
    * A real implementation would parse the image header and run the
    * pixel decode here; this deterministic fake derives metadata and an
    * 8-dim "feature vector" from the raw bytes so the pipeline shape is
    * fully testable. One batch per partition, streaming iterator — no
    * collect, no per-row serialization boundary. */
  def decodeStub(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    assets.select("doc_id", "payload", "media_type").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mt = r.getString(2)
        val n = bytes.length
        val w = (n % 64) + 1
        val h = (n / 64) + 1
        // fake features: mean of each of 8 byte-stripes, normalized.
        // Empty payloads get zeroed features (the stripe loop would
        // otherwise index bytes(0) on a zero-length array).
        val feats =
          if (n == 0) Array.fill(8)(0.0f)
          else Array.tabulate(8) { k =>
            val lo = k * n / 8
            val hi = math.max(lo + 1, (k + 1) * n / 8)
            var s = 0.0
            var i = lo
            while (i < hi) { s += (bytes(i) & 0xff); i += 1 }
            (s / (hi - lo) / 255.0).toFloat
          }
        Row(id, mt, n, w, h, 3, feats.toSeq)
      }
    }(enc)
  }

  /** "Resize" analog over decoded features: downsample the feature vector
    * by striding — stands in for image resize / audio frame-sampling. */
  def sampleFeatures(decoded: DataFrame, stride: Int): DataFrame =
    decoded.withColumn("features",
      expr(s"filter(features, (x, i) -> i % $stride = 0)"))

  val defs: Map[String, QueryDef] = Map(
    // rows-only: decode stub uses JVM-side logic, not SQL-expressible
    "mm_decode_pipeline" -> QueryDef.rowsOnly { (s, d) =>
      val assets = asBinaryAssets(documents(s, d), "doc_id", "text")
        .repartition(col("doc_id")) // decode parallelism = partition count
      val decoded = decodeStub(assets)
      sampleFeatures(decoded, 2)
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          round(element_at(col("features"), 1), 6).as("f0"))
        .orderBy("doc_id")
    },
  )
}
