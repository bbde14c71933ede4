package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Binary-column plumbing: typed decode/featurize/resize/frame-sample over
  * opaque payloads (stub decoders, real Spark mechanics). */
class MultimodalSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"
  def media = Multimodal.asMedia(Tables.documents(spark, sf))

  test("decode pipeline emits fixed-dim features with stable checksums") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == Multimodal.FakeDecoder.dim))
    // deterministic: same input -> same checksum on a second run
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(f => f.doc_id -> f.checksum).toMap ==
      again.map(f => f.doc_id -> f.checksum).toMap)
  }

  test("resize stub normalizes payload sizes") {
    val resized = Multimodal.resizeStub(media, 64).collect()
    assert(resized.forall(r => r.n_bytes == 64L && r.content.length == 64))
  }

  test("frame sampling emits every Nth fixed-size slice") {
    val frames = Multimodal.frameSampleStub(media, frameBytes = 32, everyNth = 2)
    val byDoc = frames.collect().groupBy(_.doc_id)
    val lens = media.collect().map(r => r.doc_id -> r.content.length).toMap
    byDoc.foreach { case (id, fs) =>
      val expected = (0 until lens(id) / 32 by 2).size
      assert(fs.length == expected)
      assert(fs.forall(_.content.length == 32))
    }
  }
}
