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

  test("real PNG bytes decode through the mapPartitions codec path") {
    import spark.implicits._
    // synthesized PNG fixtures with KNOWN pixel statistics: image k is
    // w×h with rgb(x, y, k) = ((x + k) % 256, (y + k) % 256, k) —
    // per-channel means are exact integer arithmetic we recompute here
    def png(k: Int, w: Int, h: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        im.setRGB(x, y, (((x + k) % 256) << 16) | (((y + k) % 256) << 8) | (k & 0xFF))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos), "no PNG writer registered")
      bos.toByteArray
    }
    def meanMod(k: Int, n: Int): Double =
      (0 until n).map(i => (i + k) % 256).sum.toDouble / n
    val fixtures = Seq((1L, 17, 9), (2L, 64, 64), (3L, 300, 2))
    val corrupt = MediaFile(99L, "image", Array[Byte](1, 2, 3), 0, 0, 0, 0)
    val media = fixtures.map { case (id, w, h) =>
      MediaFile(id, "image", png(id.toInt, w, h), w, h, 0, 0)
    } :+ corrupt
    val ds = spark.createDataset(media).repartition(2)
    ImageIoCodec.inits.set(0L)
    val got = decodeImageStats(ds).collect().map(s => s.media_id -> s).toMap
    // one REAL codec per partition, corrupt row dropped not fatal
    assert(ImageIoCodec.inits.get() == 2, s"inits: ${ImageIoCodec.inits.get()}")
    assert(!got.contains(99L), "corrupt payload must be quarantined, not decoded")
    fixtures.foreach { case (id, w, h) =>
      val s = got(id)
      assert(s.width == w && s.height == h && s.n_pixels == w.toLong * h,
        s"image $id decoded ${s.width}x${s.height}")
      assert(math.abs(s.mean_r - meanMod(id.toInt, w)) < 1e-9, s"image $id mean_r")
      assert(math.abs(s.mean_g - meanMod(id.toInt, h)) < 1e-9, s"image $id mean_g")
      assert(s.mean_b == (id.toInt & 0xFF).toDouble, s"image $id mean_b")
    }
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
