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
    assert(r.getAs[collection.Seq[Float]]("features").length == 8)
    // determinism: same input → same features
    val again = Multimodal.decodeStub(assets).filter(col("doc_id") === 1).collect().head
    assert(again.getAs[collection.Seq[Float]]("features") == r.getAs[collection.Seq[Float]]("features"))

    val sampled = Multimodal.sampleFeatures(decoded, 2)
    assert(sampled.filter(col("doc_id") === 1).collect().head
      .getAs[collection.Seq[Float]]("features").length == 4)
  }
}
