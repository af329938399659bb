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

  test("real WAV bytes decode through the mapPartitions codec path") {
    import spark.implicits._
    // synthesized 16-bit PCM WAV fixtures with KNOWN signal statistics:
    // a constant DC signal at amplitude a has rms == peak == a exactly;
    // a full-period square wave at amplitude a likewise. Durations and
    // frame counts come from the synthesized sample count.
    def wav(samples: Array[Short], sampleRate: Float, channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val half = (0.5 * 32768).toShort // amplitude 0.5 exactly (16384/32768)
    val quarter = (0.25 * 32768).toShort
    val dcMono = wav(Array.fill(8000)(half), 8000f, 1) // 1 s @ 8 kHz mono
    val sqStereo = wav( // 0.5 s @ 16 kHz stereo alternating +/- 0.25
      Array.tabulate(16000)(i => if (i % 2 == 0) quarter else (-quarter).toShort),
      16000f, 2)
    val corrupt = MediaFile(99L, "audio", Array[Byte](9, 9, 9), 0, 0, 0, 0)
    val media = Seq(
      MediaFile(1L, "audio", dcMono, 0, 0, 8000, 0),
      MediaFile(2L, "audio", sqStereo, 0, 0, 16000, 0)) :+ corrupt
    val ds = spark.createDataset(media).repartition(2)
    WavCodec.inits.set(0L)
    val got = decodeAudioStats(ds).collect().map(s => s.media_id -> s).toMap
    assert(WavCodec.inits.get() == 2, s"inits: ${WavCodec.inits.get()}")
    assert(!got.contains(99L), "corrupt payload must be quarantined, not decoded")
    val a = got(1L)
    assert(a.sample_rate_hz == 8000 && a.n_channels == 1 && a.n_samples == 8000L)
    assert(a.duration_s == 1.0 && a.rms == 0.5 && a.peak == 0.5)
    val b = got(2L)
    assert(b.sample_rate_hz == 16000 && b.n_channels == 2 && b.n_samples == 8000L)
    assert(b.duration_s == 0.5 && b.rms == 0.25 && b.peak == 0.25)
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

  test("real-codec dHash: block-exact grays, copy/near/far distances, undecodable -> None") {
    // 90x160 image of 10x10 uniform blocks == the 16x9 grid exactly,
    // so cell means ARE the block grays and every comparison is chosen
    def blockPng(gray: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        90, 160, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 160; x <- 0 until 90) {
        val v = gray(y / 10, x / 10) & 0xFF
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos))
      bos.toByteArray
    }
    def hamming(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val codec = new ImageIoCodec
    val asc = blockPng((_, c) => c * 20)           // increasing -> all bits 0
    val desc = blockPng((_, c) => (8 - c) * 20)    // decreasing -> all bits 1
    val near = blockPng((r, c) =>                   // one bumped cell
      if (r == 3 && c == 4) 200 else c * 20)
    val Some(hAsc) = codec.dHash(asc)
    val Some(hDesc) = codec.dHash(desc)
    val Some(hNear) = codec.dHash(near)
    assert(hAsc.forall(_ == 0))
    assert(hDesc.forall(_ == 0xFFFF))
    assert(hamming(hAsc, hDesc) == 128)
    // identical bytes -> identical hash
    assert(hamming(hAsc, codec.dHash(blockPng((_, c) => c * 20)).get) == 0)
    // the bump touches two comparisons but can only flip ONE on a
    // monotone base (flipping both needs v < G(3,3) AND v > G(3,5)):
    // the right-neighbor comparison 200 > 100 turns true
    assert(hamming(hAsc, hNear) == 1)
    assert(codec.dHash(Array[Byte](9, 9, 9)).isEmpty)   // undecodable
    assert(codec.dHash(blockPng((_, _) => 1).take(0)).isEmpty)
  }

  test("applyPhashSurvivors: copies fall to their originals, non-images pass through, batch dominated set == online dropped set") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = synthesize(spark, sf).toDF()
    val replayed = base
      .filter($"kind" === "image" && $"media_id" < 30)
      .withColumn("media_id", $"media_id" + 1000000L)
    val all = base.unionByName(replayed)
    val surv = applyPhashSurvivors(all, maxHamming = 6)

    // non-image media are untouched
    assert(surv.filter($"kind" =!= "image").count() ==
      all.filter($"kind" =!= "image").count())
    // every replayed copy is dominated by its (identical, lower-id) original
    assert(surv.filter($"media_id" >= 1000000L).count() == 0L)
    val nImgAll = all.filter($"kind" === "image").count()
    val nImgSurv = surv.filter($"kind" === "image").count()
    assert(nImgSurv > 0 && nImgSurv < nImgAll)

    // keep-first equivalence with the ONLINE index: arrival order = id
    // order, so the streaming drop set must equal the batch dominated
    // set exactly (see applyPhashSurvivors doc for the twin argument)
    val dominated = all.filter($"kind" === "image")
      .join(surv.select($"media_id"), Seq("media_id"), "left_anti")
      .select($"media_id").as[Long].collect().toSet
    val onlineDropped = graft.streaming.NearDup
      .imageNearDupPairs(all, maxHamming = 6)
      .toDF().select($"id_b").distinct().as[Long].collect().toSet
    assert(dominated == onlineDropped)
  }

  test("applyAudioSurvivors: same keep-first equivalence for the audio family") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = synthesize(spark, sf).toDF()
    val replayed = base
      .filter($"kind" === "audio" && $"media_id" < 30)
      .withColumn("media_id", $"media_id" + 1000000L)
    val all = base.unionByName(replayed)
    val surv = applyAudioSurvivors(all, maxHamming = 6)
    assert(surv.filter($"kind" =!= "audio").count() ==
      all.filter($"kind" =!= "audio").count())
    assert(surv.filter($"media_id" >= 1000000L).count() == 0L)
    val dominated = all.filter($"kind" === "audio")
      .join(surv.select($"media_id"), Seq("media_id"), "left_anti")
      .select($"media_id").as[Long].collect().toSet
    val onlineDropped = graft.streaming.NearDup
      .audioNearDupPairs(all, maxHamming = 6)
      .toDF().select($"id_b").distinct().as[Long].collect().toSet
    assert(dominated == onlineDropped)
  }

  test("real-codec audio fingerprint: copy at hamming 0, gain-invariant, noise separates, undecodable -> None") {
    def wav(samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def hamming(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val codec = new WavCodec
    // a deterministic pseudo-melody: varied per-window energies
    val rnd = new scala.util.Random(7)
    val sig = Array.tabulate[Short](6500)(i =>
      ((rnd.nextInt(8192) + 1024) * math.sin(i / 17.0)).toShort)
    val h = codec.fingerprint(wav(sig)).get
    assert(h.length == 8 && h.exists(_ != 0))
    // exact copy
    assert(hamming(h, codec.fingerprint(wav(sig)).get) == 0)
    // uniform gain (exact integer halving): energy deltas keep sign
    val half = sig.map(s => (s / 2).toShort)
    assert(hamming(h, codec.fingerprint(wav(half)).get) == 0)
    // small local perturbation: near, not identical windows elsewhere
    val noisy = sig.clone(); for (i <- 0 until 200) noisy(i) = (noisy(i) / 3).toShort
    val hn = hamming(h, codec.fingerprint(wav(noisy)).get)
    assert(hn <= 24, s"local noise must stay near: $hn")
    // a different melody is far
    val other = Array.tabulate[Short](6500)(i =>
      ((rnd.nextInt(8192) + 1024) * math.cos(i / 5.0)).toShort)
    assert(hamming(h, codec.fingerprint(wav(other)).get) > 24)
    // undecodable
    assert(codec.fingerprint(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("videoPhashPairs: a re-encoded video still pairs; the exact-frame detector misses it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = synthesize(spark, sf).toDF()
    // "re-encode": the order-preserving intensity shift — every byte
    // (and so every frame md5) changes, every dHash comparison holds
    val reencoded = base
      .filter($"kind" === "video" && $"media_id" < 30)
      .withColumn("media_id", $"media_id" + 1000000L)
      .withColumn("content", encode(
        translate(decode($"content", "UTF-8"), ReencodeFrom, ReencodeTo),
        "UTF-8"))
    val all = base.unionByName(reencoded)
    val isCopyPair = ($"id_b" >= 1000000L) && ($"id_a" === $"id_b" - 1000000L)

    // exact-frame detector: the re-encode rewrites every byte, so a
    // copy shares ZERO frame md5s with its original — even at
    // minShared = 1 no copy-original pair exists
    assert(videoFramePairs(all, minShared = 1).filter(isCopyPair).count() == 0L)

    // perceptual detector: every copy with >= 2 distinct sampled-frame
    // fingerprints pairs its original, with EVERY frame matched
    // (n_shared == nh on both sides — hamming 0 across the board)
    val copyPairs = videoPhashPairs(all, maxHamming = 6, minShared = 2)
      .filter(isCopyPair)
      .select($"n_shared", $"nh_a", $"nh_b").collect()
    assert(copyPairs.length >= 8, s"only ${copyPairs.length} re-encoded copies paired")
    copyPairs.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(1) == r.getLong(2),
        s"re-encoded copy matched only partially: $r")
    }
  }
}
