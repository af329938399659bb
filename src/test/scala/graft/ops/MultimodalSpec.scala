package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import Multimodal._

  private val sf = "/root/testdata/sf0.001"

  test("synthesize: typed media rows with binary payloads and metadata") {
    val media = synthesize(spark, sf)
    val first = media.orderBy("media_id").head()
    assert(Set("image", "audio", "video")(first.kind))
    assert(first.content.nonEmpty)
    assert(first.width >= 16 && first.height >= 16)
    assert(media.count() == 500)
  }

  test("extractFeatures matches the stub codec computed locally") {
    val media = synthesize(spark, sf)
    val sample = media.orderBy("media_id").head()
    val feats = extractFeatures(media)
    val got = feats.filter(_.media_id == sample.media_id).head()
    assert(got.n_bytes == sample.content.length.toLong)
    assert(got.feature.toSeq == StubCodec.extract(sample.content).toSeq)
    assert(got.feature.length == StubCodec.featureDim)
  }

  test("resizeImages: images shrink by stride, other kinds untouched") {
    val media = synthesize(spark, sf)
    val before = media.collect().map(m => m.media_id -> m).toMap
    val after = resizeImages(media, 2).collect()
    after.foreach { m =>
      val b = before(m.media_id)
      if (m.kind == "image") {
        assert(m.content.length == (b.content.length + 1) / 2)
        assert(m.width == b.width / 2)
      } else {
        assert(m.content.sameElements(b.content))
      }
    }
  }

  test("frame sampling: every k-th of n chunks") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val frames = StubCodec.sampleFrames(bytes, nFrames = 10, k = 2)
    assert(frames.length == 5)
    assert(frames.head.head == 0.toByte && frames(1).head == 20.toByte)
    assert(StubCodec.sampleFrames(bytes, 0, 2).isEmpty)
  }

  test("codec initialized once per partition, not per row") {
    // real codecs are expensive to construct; the mapPartitions
    // operators must amortize one instance across the partition
    val media = synthesize(spark, "/root/testdata/sf0.001").repartition(4)
    val nRows = media.count()
    assert(nRows > 4, s"need more rows than partitions, got $nRows")
    CodecInstance.inits.set(0L)
    extractFeatures(media).collect()
    val afterExtract = CodecInstance.inits.get()
    assert(afterExtract == 4, s"extractFeatures inits: $afterExtract (rows=$nRows)")
    CodecInstance.inits.set(0L)
    resizeImages(media, 2).collect()
    assert(CodecInstance.inits.get() == 4,
      s"resizeImages inits: ${CodecInstance.inits.get()}")
  }
}
