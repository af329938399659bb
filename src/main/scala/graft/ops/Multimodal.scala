package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Two codecs ride the same per-partition plumbing: [[StubCodec]]
  * produces deterministic fake decodes derived from the bytes (the
  * arithmetic the DuckDB oracles can replay), and [[ImageIoCodec]]
  * decodes REAL image bytes via JDK-public `javax.imageio`
  * (spec-checked against synthesized PNG fixtures — DuckDB cannot
  * decode PNGs, so no oracle entry). Everything around them — the
  * schema, the `Dataset[T]` encoders, the per-partition batch shape
  * (decode amortized across a partition, mirroring `mapInPandas`
  * batches), and the partitioning story — is shared, so a production
  * codec (ffmpeg, ONNX) swaps in as one more class.
  *
  * Scale: media rows are large (MBs); operators never shuffle the
  * binary payload — feature extraction projects fixed-width vectors
  * first, and anything relational joins on `media_id` afterwards.
  */
object Multimodal {

  /** One media object: payload + typed metadata (the multimodal row). */
  case class MediaFile(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float])

  /** ??? boundary: a real deployment plugs javax.imageio / ffmpeg here.
    * The stub derives deterministic pseudo-content from the payload so
    * tests can assert exact values end-to-end. */
  object StubCodec {
    val featureDim = 16

    /** STUB decode+embed: fold the bytes into a fixed-width float
      * vector (stands in for decode -> model forward pass). Each lane
      * is an exact INTEGER byte sum with a single float division at
      * the end — deterministic like any stub, and exactly replayable
      * outside the JVM (an integer sum plus one correctly-rounded
      * float division carries no accumulation-order sensitivity; lane
      * sums stay below 2^24 for any payload under ~1 MiB/lane, so the
      * float cast is exact). */
    def extract(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](featureDim)
      var i = 0
      while (i < bytes.length) {
        acc(i % featureDim) += (bytes(i) & 0xFF)
        i += 1
      }
      acc.map(s => s / 255.0f)
    }

    /** STUB resize: keeps every stride-th byte of a row-major fake
      * raster (stands in for a real interpolating resize). */
    def resize(bytes: Array[Byte], stride: Int): Array[Byte] =
      bytes.grouped(stride).map(_.head).toArray

    /** STUB frame sampling: the payload split into n_frames equal
      * chunks, keeping every k-th chunk. */
    def sampleFrames(bytes: Array[Byte], nFrames: Int, k: Int): Seq[Array[Byte]] = {
      if (nFrames <= 0) Seq.empty
      else {
        val frameLen = math.max(bytes.length / nFrames, 1)
        (0 until nFrames by k).map { f =>
          bytes.slice(f * frameLen, math.min((f + 1) * frameLen, bytes.length))
        }
      }
    }
  }

  /** A codec INSTANCE — the object a real deployment makes expensive
    * to construct (ffmpeg context, JNI handle, ONNX session). Every
    * mapPartitions operator below constructs exactly ONE per partition
    * iterator and streams the partition's rows through it; the
    * construction counter makes that amortization observable
    * (MultimodalSpec asserts inits == partitions — a per-row init
    * would show up as inits == rows). Methods delegate to the
    * deterministic [[StubCodec]] stubs, so swapping a real codec in
    * changes only this class. */
  final class CodecInstance {
    CodecInstance.inits.incrementAndGet()
    def extract(bytes: Array[Byte]): Array[Float] = StubCodec.extract(bytes)
    def resize(bytes: Array[Byte], stride: Int): Array[Byte] = StubCodec.resize(bytes, stride)
    def sampleFrames(bytes: Array[Byte], nFrames: Int, k: Int): Seq[Array[Byte]] =
      StubCodec.sampleFrames(bytes, nFrames, k)
  }
  object CodecInstance {
    /** JVM-local construction count (observable under local[*]; on a
      * cluster each executor counts its own). */
    val inits = new java.util.concurrent.atomic.AtomicLong
  }

  /** Decoded-image statistics: the real-codec twin of
    * [[MediaFeatures]] (width/height read from the BYTES, not the
    * metadata columns — the decode is the ground truth). */
  case class ImageStats(
      media_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** A REAL image codec behind the same per-partition amortization
    * contract as [[CodecInstance]]: `javax.imageio` is JDK-public
    * (zero added dependencies), so PNG/JPEG/BMP bytes genuinely
    * decode — this is the drop-in the [[StubCodec]] doc promises,
    * proving the mapPartitions plumbing carries real media, while the
    * stub stays the arithmetic fixture the DuckDB oracles replay
    * (DuckDB cannot decode PNGs, so real decodes are spec-checked
    * against fixtures with known pixel stats instead of
    * hash-compared). Construction is counted like the stub's so the
    * one-instance-per-partition invariant stays observable. */
  final class ImageIoCodec {
    ImageIoCodec.inits.incrementAndGet()

    /** Decode to (width, height, per-channel means). Returns None for
      * bytes no registered reader accepts — a corrupt row must tag
      * itself, never kill the partition (at 100 TB some rows WILL be
      * truncated). */
    def decodeStats(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: java.io.IOException => None }
      img.map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            sr += (rgb >> 16) & 0xFF
            sg += (rgb >> 8) & 0xFF
            sb += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }
    /** dHash over the DECODED pixels: mean gray per cell of a 16x9
      * grid partition of the image, neighbor comparisons packed into
      * the same 8 bands of 16 bits as [[stubBandExprs]] — the
      * real-codec form of `mm_phash_pairs`'s 128-bit hash
      * (spec-checked on PNG fixtures with block-exact cell means;
      * DuckDB cannot decode PNGs, so this path carries no oracle).
      * None for undecodable bytes or images smaller than the grid. */
    def dHash(bytes: Array[Byte]): Option[Array[Int]] = {
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: java.io.IOException => None }
      img.filter(im => im.getWidth >= 9 && im.getHeight >= 16).map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        val g = Array.ofDim[Double](16, 9)
        var r = 0
        while (r < 16) {
          var c = 0
          while (c < 9) {
            val (x0, x1) = (c * w / 9, math.max(c * w / 9 + 1, (c + 1) * w / 9))
            val (y0, y1) = (r * h / 16, math.max(r * h / 16 + 1, (r + 1) * h / 16))
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = im.getRGB(x, y)
                sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            g(r)(c) = sum.toDouble / (3L * (x1 - x0) * (y1 - y0))
            c += 1
          }
          r += 1
        }
        (0 until 8).map { band =>
          (0 until 16).foldLeft(0) { (acc, j) =>
            val k = band * 16 + j
            val (rr, cc) = (k / 8, k % 8)
            if (g(rr)(cc) > g(rr)(cc + 1)) acc | (1 << j) else acc
          }
        }.toArray
      }
    }
  }
  object ImageIoCodec {
    val inits = new java.util.concurrent.atomic.AtomicLong
  }

  /** Decoded-audio statistics: the real-codec audio twin of
    * [[ImageStats]] (sample rate / channel count / length read from
    * the BYTES, not the metadata columns). */
  case class AudioStats(
      media_id: Long,
      sample_rate_hz: Int,
      n_channels: Int,
      n_samples: Long,
      duration_s: Double,
      rms: Double,
      peak: Double)

  /** A REAL audio codec behind the same per-partition amortization
    * contract: `javax.sound.sampled` is JDK-public (zero added
    * dependencies), so WAV/PCM bytes genuinely decode — the audio
    * counterpart of [[ImageIoCodec]], completing the "real bytes
    * through the codec path" story for the second media kind. Scope is
    * 16-bit signed PCM (the dominant WAV encoding); any other
    * encoding, and any bytes no reader accepts, return None — a
    * corrupt or exotic row must tag itself, never kill the partition
    * or decode wrongly. */
  final class WavCodec {
    WavCodec.inits.incrementAndGet()

    /** Decode to (sampleRate, channels, frames, duration, rms, peak)
      * with amplitudes normalized to [-1, 1]. */
    def decodeStats(bytes: Array[Byte])
        : Option[(Int, Int, Long, Double, Double, Double)] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
      val ais =
        try Some(AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
        catch {
          case _: UnsupportedAudioFileException | _: java.io.IOException => None
        }
      ais.flatMap { in =>
        try {
          val f = in.getFormat
          val ok = f.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            f.getSampleSizeInBits == 16
          if (!ok) None
          else {
            val data = in.readAllBytes()
            val bytesPerSample = 2
            val nCh = f.getChannels
            val nFrames = data.length.toLong / (bytesPerSample * nCh)
            val nVals = (nFrames * nCh).toInt
            var (sumSq, peak) = (0.0, 0.0)
            var i = 0
            while (i < nVals) {
              val off = i * 2
              val raw =
                if (f.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xFF)).toShort
                else ((data(off + 1) << 8) | (data(off) & 0xFF)).toShort
              val a = raw / 32768.0
              sumSq += a * a
              val m = math.abs(a)
              if (m > peak) peak = m
              i += 1
            }
            val rms = if (nVals == 0) 0.0 else math.sqrt(sumSq / nVals)
            Some((f.getSampleRate.toInt, nCh, nFrames,
              nFrames / f.getSampleRate.toDouble, rms, peak))
          }
        } catch { case _: java.io.IOException => None }
        finally in.close()
      }
    }

    /** 128-bit energy-delta fingerprint over the decoded PCM — the
      * REAL-codec form of [[Multimodal.audioBandExprs]]'s stub: the
      * signal is cut into 129 equal windows, window energy is the sum
      * of squared normalized amplitudes, and bit k is the sign of the
      * adjacent-energy delta e(k) > e(k+1), packed 16 bits per band in
      * the family's shared layout (bit j of band b is position
      * b*16 + j, weight 1 << j). Energy-delta signs are invariant
      * under uniform gain (energies scale by gain², comparisons are
      * preserved) — the property that makes this a FINGERPRINT rather
      * than a checksum. Undecodable or empty audio returns None. */
    def fingerprint(bytes: Array[Byte]): Option[Array[Int]] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
      val ais =
        try Some(AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
        catch {
          case _: UnsupportedAudioFileException | _: java.io.IOException => None
        }
      ais.flatMap { in =>
        try {
          val f = in.getFormat
          val ok = f.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            f.getSampleSizeInBits == 16
          if (!ok) None
          else {
            val data = in.readAllBytes()
            val nVals = data.length / 2
            if (nVals < 1) None
            else {
              val e = new Array[Double](129)
              var i = 0
              while (i < nVals) {
                val off = i * 2
                val raw =
                  if (f.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xFF)).toShort
                  else ((data(off + 1) << 8) | (data(off) & 0xFF)).toShort
                val a = raw / 32768.0
                // window w covers vals [w*nVals/129, (w+1)*nVals/129)
                e((i.toLong * 129 / nVals).toInt) += a * a
                i += 1
              }
              Some((0 until 8).map { band =>
                (0 until 16).foldLeft(0) { (acc, j) =>
                  val k = band * 16 + j
                  if (e(k) > e(k + 1)) acc | (1 << j) else acc
                }
              }.toArray)
            }
          }
        } catch { case _: java.io.IOException => None }
        finally in.close()
      }
    }
  }
  object WavCodec {
    val inits = new java.util.concurrent.atomic.AtomicLong
  }

  /** Decode audio payloads with the REAL codec — one [[WavCodec]] per
    * partition, rows streamed through it, undecodable payloads
    * quarantined by dropping; same shape as [[decodeImageStats]]. */
  def decodeAudioStats(media: Dataset[MediaFile]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new WavCodec // once per partition, not per row
      rows.flatMap { m =>
        codec.decodeStats(m.content).map { case (sr, ch, n, dur, rms, peak) =>
          AudioStats(m.media_id, sr, ch, n, dur, rms, peak)
        }
      }
    }
  }

  /** Decode image payloads with the REAL codec — one [[ImageIoCodec]]
    * per partition, rows streamed through it, exactly the
    * [[extractFeatures]] batch shape. Undecodable payloads are
    * dropped (flatMap), mirroring how a production pipeline quarantines
    * corrupt media rather than failing the job. */
  def decodeImageStats(media: Dataset[MediaFile]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new ImageIoCodec // once per partition, not per row
      rows.flatMap { m =>
        codec.decodeStats(m.content).map { case (w, h, r, g, b) =>
          ImageStats(m.media_id, w, h, w.toLong * h, r, g, b)
        }
      }
    }
  }

  /** Synthesize a deterministic media table from `documents` (text
    * bytes as payload) — the driver testdata has no binary table, so
    * this gives the plumbing a reproducible input. */
  def synthesize(spark: SparkSession, sfDir: String): Dataset[MediaFile] = {
    import spark.implicits._
    table(spark, sfDir, "documents")
      .select(
        $"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
        encode($"text", "UTF-8").as("content"),
        (pmod($"doc_id", lit(64)) + 16).cast("int").as("width"),
        (pmod($"doc_id", lit(48)) + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod($"doc_id", lit(30)) + 1).cast("int").as("n_frames"))
      .as[MediaFile]
  }

  /** Feature extraction over batches: one codec instance per
    * partition, rows streamed through it — the Scala equivalent of a
    * `mapInPandas` batch loop. */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new CodecInstance // once per partition, not per row
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          codec.extract(m.content))
      }
    }
  }

  /** Resize every image payload in place (stub), preserving schema. */
  def resizeImages(media: Dataset[MediaFile], stride: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new CodecInstance // once per partition, not per row
      rows.map { m =>
        if (m.kind == "image")
          m.copy(content = codec.resize(m.content, stride),
            width = m.width / stride, height = m.height / stride)
        else m
      }
    }
  }

  /** Perceptual-hash (dHash) bands from the STUB decode: gray sample k
    * of a payload is the byte at position `1 + (k * 7919) % len`
    * (prime-stride sampling — deterministic, position-spread), and bit
    * (r, c) of the 16x8 difference hash compares grid neighbors
    * `G(r,c) > G(r,c+1)` over a 16x9 sample grid — a 128-bit
    * fingerprint packed into 8 bands of 16 bits. The band COUNT (8)
    * carries the pigeonhole completeness at hamming <= 6; the band
    * WIDTH (16 bits) carries the candidate selectivity: an 8-bit band
    * value space collides at rate 1/256, which at a 10^5-item corpus
    * concentrates ~N/256 items per bucket and grows candidates as
    * N²·bands/256 — measured as a genuine blowup (executor OOM) in
    * the 100× distinct-docs artifact run. 16-bit bands collide at
    * 1/65536 (candidates N²·bands/65536 — 305k at 50k items), the
    * multi-index-hashing sizing rule: |band value space| must scale
    * with corpus size, fingerprint width = bands × band width. The
    * SAME SQL text runs as a Spark `expr` and inside the DuckDB
    * oracle — the fixture payloads are UTF-8 text, so
    * `ascii(substring(...))` reads the sampled character's code point
    * identically in both engines (both index and measure length in
    * CHARACTERS). A real deployment swaps [[ImageIoCodec.dHash]] in
    * for the sampling (same band layout; spec-checked on PNG fixtures
    * — DuckDB cannot decode PNGs). */
  private[graft] def stubBandExprs(txt: String, len: String): Seq[String] = {
    def gray(k: Int) = s"ascii(substring($txt, 1 + ($k * 7919) % $len, 1))"
    (0 until 8).map { band =>
      (0 until 16).map { j =>
        val k = band * 16 + j
        val r = k / 8
        val c = k % 8
        s"(CASE WHEN ${gray(r * 9 + c)} > ${gray(r * 9 + c + 1)} THEN ${1 << j} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }
  }

  /** Image near-dup pairs by banded perceptual hash: images sharing
    * any 16-bit band are candidates (pigeonhole: hamming <= 7 implies
    * a shared band, so threshold 6 is COMPLETE by construction), then
    * the exact hamming distance verifies via `bit_count(xor)` over
    * the band bytes. The banded equi-join is the dedup family's scale
    * shape — candidates are pair-bound by true collisions, never all
    * pairs — and the oracle checks the NAIVE all-pairs hamming, so
    * candidate completeness itself is what the hash-compare holds. */
  def phashPairs(media: DataFrame, maxHamming: Int): DataFrame = {
    import media.sparkSession.implicits._
    // leased: the hashed projection feeds the posting explode AND both
    // verify joins — three consumers that must not re-scan the media
    // table (payload bytes dominate a multimodal corpus; the hash
    // projection is 9 longs/row)
    val img = Checkpoints.lease("mm_phash", media.filter($"kind" === "image")
      .select($"media_id", decode($"content", "UTF-8").as("__txt"))
      .withColumn("__len", length($"__txt"))
      .filter($"__len" >= 1)
      .withColumn("bands",
        array(stubBandExprs("__txt", "__len").map(expr): _*))
      .select($"media_id", $"bands"))
    bandedHashPairs(img, maxHamming)
  }

  /** The banded near-dup pair pipeline shared by the image and audio
    * fingerprints: `hashed` = (media_id, bands) with 8 16-bit bands;
    * any shared (band index, band value) makes a candidate (pigeonhole:
    * hamming <= 7 over 128 bits in 8 bands forces an equal band, so
    * thresholds <= 6 are COMPLETE by construction), then the exact
    * hamming verifies via bit_count(xor) folds over the band arrays
    * fetched by two id equi-joins — never an all-pairs scan. */
  private def bandedHashPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    import hashed.sparkSession.implicits._
    val posted = hashed.select($"media_id",
      posexplode($"bands").as(Seq("band_idx", "band_val")))
    val cand = posted.as("a").join(posted.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    cand
      .join(hashed.select($"media_id".as("id_a"), $"bands".as("__ba")), Seq("id_a"))
      .join(hashed.select($"media_id".as("id_b"), $"bands".as("__bb")), Seq("id_b"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(__ba, __bb, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"))
      .filter($"hamming" <= maxHamming)
      .select($"id_a", $"id_b", $"hamming")
  }

  /** Audio fingerprint bands from the STUB decode — the audio twin of
    * [[stubBandExprs]]: "amplitude" sample i is the byte at prime
    * stride 4409 (a different stride than the image hash, so the two
    * fingerprints are uncorrelated even on identical payloads),
    * "window energy" e(k) sums two adjacent samples, and bit k of the
    * 128-bit fingerprint is the energy-delta sign e(k) > e(k+1) over
    * 129 windows — the shape of a real spectral fingerprint
    * (Chromaprint's band-energy differences; Haitsma-Kalker's
    * sign-of-difference descriptor), on deterministic arithmetic BOTH
    * engines evaluate identically. Packed 16 bits per band like the
    * image hash (see [[stubBandExprs]] for the width-vs-count sizing
    * argument), so the 8-band pigeonhole completeness carries over
    * unchanged. The real-codec form is [[WavCodec.fingerprint]] (same
    * band layout over true PCM window energies; spec-checked on WAV
    * fixtures — DuckDB cannot decode WAV). */
  private[graft] def audioBandExprs(txt: String, len: String): Seq[String] = {
    def amp(i: Int) = s"ascii(substring($txt, 1 + ($i * 4409) % $len, 1))"
    def energy(k: Int) = s"(${amp(2 * k)} + ${amp(2 * k + 1)})"
    (0 until 8).map { band =>
      (0 until 16).map { j =>
        val k = band * 16 + j
        s"(CASE WHEN ${energy(k)} > ${energy(k + 1)} THEN ${1 << j} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }
  }

  /** Audio near-dup pairs by banded energy-delta fingerprint — the
    * audio member of the banded near-dup family ([[phashPairs]] doc
    * has the completeness argument; [[bandedHashPairs]] is the shared
    * pipeline). */
  def audioFingerprintPairs(media: DataFrame, maxHamming: Int): DataFrame = {
    import media.sparkSession.implicits._
    val aud = Checkpoints.lease("mm_afp", media.filter($"kind" === "audio")
      .select($"media_id", decode($"content", "UTF-8").as("__txt"))
      .withColumn("__len", length($"__txt"))
      .filter($"__len" >= 1)
      .withColumn("bands",
        array(audioBandExprs("__txt", "__len").map(expr): _*))
      .select($"media_id", $"bands"))
    bandedHashPairs(aud, maxHamming)
  }

  /** Image near-dup dedup APPLIED — the survivor-set transform over
    * the [[phashPairs]] graph, mirroring `dd_apply_lsh`'s shape
    * exactly ([[Dedup.collapseApplySurvivors]]): collapse
    * content-identical media first (twins share bands, so the group
    * minimum stands for all of them — no quadratic within-group
    * pairs), run the banded phash pipeline on eligible image reps
    * only, keep-first = the lower id of every verified pair survives,
    * twins of an eligible rep fall with it, and survivors are one
    * anti-join. Non-image media pass through untouched (the group key
    * carries `kind`, and only image reps are eligible). Dropped-set
    * equivalence with the ONLINE index
    * ([[graft.streaming.NearDup.imageNearDupPairs]]) is spec-held:
    * arrival order = id order makes the streaming keep-first drop set
    * equal this batch dominated set. */
  def applyPhashSurvivors(media: DataFrame, maxHamming: Int): DataFrame =
    applyBandedSurvivors(media, "image", phashPairs, maxHamming)

  /** Audio near-dup dedup APPLIED — same survivor algebra over the
    * [[audioFingerprintPairs]] graph (see [[applyPhashSurvivors]]);
    * every media kind with a detector now ships its transform too. */
  def applyAudioSurvivors(media: DataFrame, maxHamming: Int): DataFrame =
    applyBandedSurvivors(media, "audio", audioFingerprintPairs, maxHamming)

  /** Video near-dup dedup APPLIED — the same survivor algebra over
    * the [[videoFramePairs]] graph (keep-first on shared-frame
    * evidence; a content twin falls with its rep even when it has too
    * few sampled frames to clear the pair threshold — the collapse
    * rule, identical in the oracle). All three media kinds now ship
    * detector AND transform. */
  def applyVideoSurvivors(media: DataFrame, minShared: Int): DataFrame =
    applyBandedSurvivors(media, "video", videoFramePairs, minShared)

  /** Video near-dup pairs by SHARED SAMPLED FRAMES — the video member
    * of the near-dup family, built on the same frame sampling
    * `mm_frames` accounts for (every 3rd of the `n_frames` equal
    * chunks): two videos are near-dups when >= `minShared` of their
    * distinct sampled-frame hashes coincide, position-independent (a
    * trimmed or re-cut video keeps most frames but shifts them — the
    * content-defined-chunking argument at frame granularity; full
    * per-frame perceptual matching composes this operator with the
    * image dHash by hashing frames perceptually instead of exactly).
    * Emits (id_a, id_b, n_shared, nh_a, nh_b) — the counts make the
    * containment direction readable (n_shared / nh_a).
    *
    * Scale shape: one frame-hash postings explode (bounded by
    * n_frames/3 per video), a hash equi-join for candidates with a
    * pair-keyed counting aggregate (map-side combine) — the
    * exact-substring dedup shape at frame granularity, never
    * all-pairs. The oracle replays chunking arithmetic, hashing, and
    * the pair counts verbatim. */
  def videoFramePairs(media: DataFrame, minShared: Int): DataFrame = {
    import media.sparkSession.implicits._
    val vids = media.filter($"kind" === "video")
      .select($"media_id", decode($"content", "UTF-8").as("__txt"), $"n_frames")
      .withColumn("__len", length($"__txt"))
      .filter($"__len" >= 1)
      .withColumn("fl", greatest(($"__len" / $"n_frames").cast("int"), lit(1)))
    // leased: the frame-hash postings feed both candidate sides AND
    // the per-video size aggregate — three consumers that must not
    // re-scan the media payloads (same discipline as the banded
    // fingerprint projections)
    val postings = Checkpoints.lease("mm_vframes", vids
      .select($"media_id", $"fl", $"__txt",
        explode(sequence(lit(0), $"n_frames" - 1, lit(3))).as("x"))
      .select($"media_id", expr("substring(__txt, x * fl + 1, fl)").as("sub"))
      .filter(length($"sub") > 0)
      .select($"media_id", md5($"sub").as("fh"))
      .distinct())
    val sizes = postings.groupBy($"media_id").agg(count(lit(1)).as("nh"))
    postings.as("a")
      .join(postings.as("b"),
        col("a.fh") === col("b.fh") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minShared)
      .join(sizes.select($"media_id".as("id_a"), $"nh".as("nh_a")), Seq("id_a"))
      .join(sizes.select($"media_id".as("id_b"), $"nh".as("nh_b")), Seq("id_b"))
      .select($"id_a", $"id_b", $"n_shared", $"nh_a", $"nh_b")
  }

  /** PERCEPTUAL video near-dup pairs — [[videoFramePairs]] with the
    * per-frame md5 replaced by the per-frame dHash band layout
    * ([[stubBandExprs]] over each sampled frame), exactly the
    * composition the exact-frame detector's doc names: frame matching
    * becomes hamming <= `maxHamming` instead of byte equality, so the
    * detector survives RE-ENCODES (a global gain/brightness shift
    * rewrites every byte and kills every md5, but an order-preserving
    * intensity map preserves every neighbor comparison and leaves the
    * dHash untouched) on top of the trims/re-cuts the shared-frame
    * shape already handles.
    *
    * Scale shape: per-frame fingerprints lease once (one media scan);
    * candidates come from the banded posting equi-join on (band_idx,
    * band_val) — the [[bandedHashPairs]] discipline at FRAME
    * granularity, pair-bound by true 16-bit band collisions, never
    * all frame pairs — then exact hamming verifies in-row and a
    * pair-keyed aggregate counts each left video's distinct matched
    * fingerprints (map-side combinable). `n_shared` counts DISTINCT
    * left-side fingerprints with >= 1 perceptual match in the right
    * video, so one noisy right frame can't inflate the score;
    * `nh_a`/`nh_b` are distinct-fingerprint counts, making the
    * containment direction readable as n_shared / nh_a. The oracle
    * checks the NAIVE all-frame-pairs hamming, so banded candidate
    * completeness (pigeonhole over 8 bands) is what the hash-compare
    * holds. */
  def videoPhashPairs(
      media: DataFrame, maxHamming: Int, minShared: Int): DataFrame = {
    import media.sparkSession.implicits._
    val vids = media.filter($"kind" === "video")
      .select($"media_id", decode($"content", "UTF-8").as("__txt"), $"n_frames")
      .withColumn("__len", length($"__txt"))
      .filter($"__len" >= 1)
      .withColumn("fl", greatest(($"__len" / $"n_frames").cast("int"), lit(1)))
    // leased: the per-frame fingerprint projection feeds the posting
    // explode, both candidate sides, and the size aggregate — the
    // payload bytes are scanned exactly once
    val frames = Checkpoints.lease("mm_vphash", vids
      .select($"media_id", $"fl", $"__txt",
        explode(sequence(lit(0), $"n_frames" - 1, lit(3))).as("x"))
      .select($"media_id", expr("substring(__txt, x * fl + 1, fl)").as("sub"))
      .withColumn("slen", length($"sub"))
      .filter($"slen" > 0)
      .withColumn("bands", array(stubBandExprs("sub", "slen").map(expr): _*))
      .select($"media_id", $"bands",
        concat_ws("-", $"bands".cast("array<string>")).as("fpk"))
      .dropDuplicates("media_id", "fpk"))
    val sizes = frames.groupBy($"media_id").agg(count(lit(1)).as("nh"))
    val posted = frames.select($"media_id", $"fpk", $"bands",
      posexplode($"bands").as(Seq("band_idx", "band_val")))
    val cand = posted.as("a").join(posted.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.fpk").as("fpk_a"), col("a.bands").as("__ba"),
        col("b.fpk").as("fpk_b"), col("b.bands").as("__bb"))
      .distinct()
    cand
      .withColumn("hamming", expr(
        "aggregate(zip_with(__ba, __bb, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"))
      .filter($"hamming" <= maxHamming)
      .groupBy($"id_a", $"id_b")
      .agg(countDistinct($"fpk_a").as("n_shared"))
      .filter($"n_shared" >= minShared)
      .join(sizes.select($"media_id".as("id_a"), $"nh".as("nh_a")), Seq("id_a"))
      .join(sizes.select($"media_id".as("id_b"), $"nh".as("nh_b")), Seq("id_b"))
      .select($"id_a", $"id_b", $"n_shared", $"nh_a", $"nh_b")
  }

  /** The order-preserving intensity shift the perceptual-video query
    * uses as its deterministic "re-encode": every printable-ASCII
    * character moves up one code point (the corpus is 32..121, so the
    * map is injective and strictly monotone on every char that
    * occurs). Every frame's bytes — and so its md5 — change, but
    * every `G(i) > G(j)` comparison is preserved, so every dHash band
    * is bit-identical. Exposed for the spec's exact-vs-perceptual
    * contrast. */
  private[graft] val ReencodeFrom: String = (32 to 126).map(_.toChar).mkString
  private[graft] val ReencodeTo: String = (33 to 127).map(_.toChar).mkString

  /** The kind-scoped keep-first survivor transform shared by the
    * banded fingerprint families: collapse content twins, run the
    * banded pair pipeline over eligible reps of `kindVal` only,
    * dominated = higher id of every verified pair plus twins of a
    * falling rep, survivors by one anti-join; other kinds pass
    * through untouched (their reps are never eligible). */
  private def applyBandedSurvivors(
      media: DataFrame, kindVal: String,
      pairs: (DataFrame, Int) => DataFrame, maxHamming: Int): DataFrame =
    Dedup.collapseApplySurvivors(media, "media_id",
      Seq(col("kind"), md5(col("content"))))(
      col("kind") === kindVal && octet_length(col("content")) >= 1) { el =>
      pairs(el, maxHamming).select(col("id_b").as("media_id")).distinct()
    }

  /** DuckDB fragment: one applied-survivor stage over input CTE `in`
    * (must expose media_id, kind, text, len — plus nf when the pair
    * evidence is frame-based). Replays [[applyBandedSurvivors]]'s
    * algebra verbatim: the (kind, md5(text)) collapse window, the
    * kind-scoped eligible reps, the `pairCtes`-supplied dominated-rep
    * evidence (must define `${p}prs` with column id_b), the twin rule
    * (a content twin falls with its rep), and the survivor anti-join.
    * Survivors land in `${p}out` (MATERIALIZED — each stage output is
    * multi-referenced by the next stage's collapse AND anti-join).
    * Shared by the standalone mm_apply_* oracles and the composed
    * pipe_media, so the stage replay has one source of truth. */
  private[graft] def applySurvivorCtes(
      p: String, in: String, kindVal: String, pairCtes: String): String =
    s"""${p}grp AS (
              SELECT *, min(media_id) OVER (PARTITION BY kind, md5(text)) AS mn
              FROM $in),
            ${p}el AS (
              SELECT * FROM ${p}grp
              WHERE media_id = mn AND kind = '$kindVal' AND len >= 1),
            $pairCtes,
            ${p}twind AS (
              SELECT g.media_id
              FROM ${p}grp g JOIN ${p}el el ON el.media_id = g.mn
              WHERE g.media_id != g.mn),
            ${p}dom AS (
              SELECT DISTINCT id_b AS media_id FROM ${p}prs
              UNION SELECT media_id FROM ${p}twind),
            ${p}out AS MATERIALIZED (
              SELECT * FROM $in
              WHERE media_id NOT IN (SELECT media_id FROM ${p}dom))"""

  /** Pair-dominated evidence for the banded fingerprint kinds (image
    * dHash / audio energy-delta): naive all-pairs hamming over the
    * eligible reps' 8-band fingerprints — defines `${p}b` and
    * `${p}prs`. */
  private[graft] def bandedPairDomCtes(
      p: String, bandsExpr: String, maxHamming: Int,
      agedGapSec: Option[Long] = None): String = {
    val ham = (1 to 8)
      .map(i => s"CAST(bit_count(xor(a.bands[$i], c.bands[$i])) AS INT)")
      .mkString(" + ")
    // aged form: the eligible set carries a synthesized `ets` column;
    // pairs orient by (ets, media_id) — the processor's arrival sort —
    // and survive iff the event-time gap clears the horizon
    agedGapSec match {
      case None =>
        s"""${p}b AS (SELECT media_id, $bandsExpr AS bands FROM ${p}el),
            ${p}prs AS (
              SELECT c.media_id AS id_b
              FROM ${p}b a JOIN ${p}b c ON a.media_id < c.media_id
              WHERE $ham <= $maxHamming)"""
      case Some(gap) =>
        s"""${p}b AS (SELECT media_id, ets, $bandsExpr AS bands FROM ${p}el),
            ${p}prs AS (
              SELECT c.media_id AS id_b
              FROM ${p}b a JOIN ${p}b c
                ON (a.ets < c.ets OR (a.ets = c.ets AND a.media_id < c.media_id))
              WHERE $ham <= $maxHamming AND c.ets - a.ets <= $gap)"""
    }
  }

  /** Pair-dominated evidence for the video kind: the shared-sampled-
    * frame counting of [[videoFramePairs]] over the eligible reps —
    * defines `${p}f`/`${p}ch`/`${p}p` and `${p}prs`. Requires `nf` on
    * the eligible-rep set. */
  private[graft] def framePairDomCtes(p: String, minShared: Int,
      agedGapSec: Option[Long] = None): String = {
    val (etsCol, etsJoin, etsGap) = agedGapSec match {
      case None => ("", "a.media_id < b.media_id", "")
      case Some(gap) => (", ets",
        "(a.ets < b.ets OR (a.ets = b.ets AND a.media_id < b.media_id))",
        s" AND b.ets - a.ets <= $gap")
    }
    s"""${p}f AS (
              SELECT media_id$etsCol, text, len, nf, greatest(len // nf, 1) AS fl
              FROM ${p}el),
            ${p}ch AS (
              SELECT media_id$etsCol, md5(sub) AS fh
              FROM (SELECT media_id$etsCol, substring(text, x * fl + 1, fl) AS sub
                    FROM (SELECT *, unnest(range(0, nf, 3)) AS x FROM ${p}f))
              WHERE length(sub) > 0),
            ${p}p AS (SELECT DISTINCT media_id$etsCol, fh FROM ${p}ch),
            ${p}prs AS (
              SELECT b.media_id AS id_b
              FROM ${p}p a JOIN ${p}p b ON a.fh = b.fh AND $etsJoin$etsGap
              GROUP BY a.media_id, b.media_id
              HAVING count(*) >= $minShared)"""
  }

  val queries: Seq[QueryDef] = Seq(

    // Binary-column relational surface: payload sizes + content hashes
    // per media kind — the part DuckDB can replay over the same bytes.
    QueryDef(
      "mm_binary_stats",
      (s, d) => {
        import s.implicits._
        synthesize(s, d).toDF()
          .groupBy($"kind")
          .agg(
            count(lit(1)).as("n"),
            sum(octet_length($"content")).as("total_bytes"),
            min(md5($"content")).as("min_hash"),
            max(md5($"content")).as("max_hash"))
          .orderBy($"kind")
      },
      Some("""SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     count(*) AS n,
                     CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                     min(md5(text)) AS min_hash,
                     max(md5(text)) AS max_hash
              FROM documents
              GROUP BY 1 ORDER BY kind""")),

    // Feature vectors from the typed mapPartitions path, reduced to a
    // checkable aggregate. The stub's lanes are integer byte sums with
    // one float division each (see StubCodec.extract), so DuckDB
    // re-derives the exact float lanes from codepoint arithmetic (the
    // corpus is ASCII: octet_length == length, byte == ord(char)) and
    // the double fold replays left-to-right via list_reduce — the
    // mapPartitions codec path is hash-checked end to end.
    QueryDef(
      "mm_features",
      (s, d) => {
        import s.implicits._
        extractFeatures(synthesize(s, d)).toDF()
          .select($"media_id", $"kind", $"n_bytes",
            round(aggregate($"feature",
              lit(0.0), (acc, x) => acc + x.cast("double")), 3).as("feature_sum"))
          .orderBy($"media_id")
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id,
                       ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
                       text,
                       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
                FROM documents),
              f AS (
                SELECT media_id, kind, n_bytes,
                       [CAST(CAST(COALESCE(list_sum(
                            [ord(text[i + 1]) for i in range(CAST(n_bytes AS INT)) if i % 16 = j]),
                            0) AS FLOAT) / CAST(255 AS FLOAT) AS FLOAT)
                        for j in range(16)] AS feature
                FROM m)
              SELECT media_id, kind, n_bytes,
                     round(list_reduce([CAST(x AS DOUBLE) for x in feature],
                       (acc, x) -> acc + x), 3) AS feature_sum
              FROM f ORDER BY media_id""")),

    // Frame sampling (every 3rd frame of each video) through the REAL
    // per-partition codec path; the oracle re-derives the frame
    // accounting arithmetically from byte lengths (DuckDB cannot slice
    // blobs, but chunk sizes are pure integer math over octet_length),
    // so the mapPartitions plumbing is end-to-end hash-checked even
    // though the payload bytes never cross engines.
    QueryDef(
      "mm_frames",
      (s, d) => {
        import s.implicits._
        synthesize(s, d)
          .filter($"kind" === "video")
          .mapPartitions { rows =>
            val codec = new CodecInstance // once per partition
            rows.map { m =>
              val frames = codec.sampleFrames(m.content, m.n_frames, 3)
              (m.media_id, m.n_frames, frames.length.toLong,
                frames.map(_.length.toLong).sum)
            }
          }
          .toDF("media_id", "n_frames", "n_sampled", "bytes_kept")
          .orderBy($"media_id")
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id,
                       octet_length(encode(text)) AS len,
                       (doc_id % 30 + 1) AS nf
                FROM documents WHERE doc_id % 3 = 2),
              f AS (
                SELECT media_id, len, nf, greatest(len // nf, 1) AS fl FROM m)
              SELECT media_id,
                     CAST(nf AS INT) AS n_frames,
                     CAST((nf + 2) // 3 AS BIGINT) AS n_sampled,
                     CAST(list_sum([greatest(least((x + 1) * fl, len) - x * fl, 0)
                                    for x in range(0, nf, 3)]) AS BIGINT) AS bytes_kept
              FROM f ORDER BY media_id""")),

    // Image near-dup pairs by banded perceptual hash (see phashPairs):
    // the first ten images are re-ingested under shifted ids (the
    // w_ann replay convention), so every scale has deterministic
    // positives — each copy pairs its original at hamming 0 — while
    // the corpus itself contributes whatever true near-collisions
    // exist. The oracle computes the NAIVE all-pairs hamming over the
    // same stub dHash — the banded plan must reproduce it exactly, so
    // candidate completeness (the pigeonhole argument) is what the
    // hash-compare checks.
    QueryDef(
      "mm_phash_pairs",
      (s, d) => {
        import s.implicits._
        val base = synthesize(s, d).toDF()
        val replayed = base
          .filter($"kind" === "image" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        phashPairs(base.unionByName(replayed), maxHamming = 6)
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val bands = stubBandExprs("text", "len").mkString("[", ", ", "]")
        val ham = (1 to 8)
          .map(i => s"CAST(bit_count(xor(a.bands[$i], c.bands[$i])) AS INT)")
          .mkString(" + ")
        s"""WITH m AS (
              SELECT doc_id AS media_id, text, length(text) AS len
              FROM documents WHERE doc_id % 3 = 0 AND length(text) >= 1
              UNION ALL
              SELECT doc_id + 1000000 AS media_id, text, length(text) AS len
              FROM documents
              WHERE doc_id % 3 = 0 AND doc_id < 30 AND length(text) >= 1),
            b AS (SELECT media_id, $bands AS bands FROM m)
            SELECT a.media_id AS id_a, c.media_id AS id_b,
                   CAST($ham AS INT) AS hamming
            FROM b a JOIN b c ON a.media_id < c.media_id
            WHERE $ham <= 6
            ORDER BY id_a, id_b"""
      }),

    // Applied image dedup (see applyPhashSurvivors): the survivor set
    // over the same replayed-copies corpus as mm_phash_pairs — every
    // copy falls to its original (identical content = twin), every
    // verified near-dup keeps its lower id, non-image media pass
    // through. The oracle replays the collapse window, the NAIVE
    // all-pairs hamming over eligible reps, the twin rule, and the
    // final anti-join — so both the pair completeness AND the
    // survivor algebra are hash-pinned.
    QueryDef(
      "mm_apply_phash",
      (s, d) => {
        import s.implicits._
        val base = synthesize(s, d).toDF()
        val replayed = base
          .filter($"kind" === "image" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        applyPhashSurvivors(base.unionByName(replayed), maxHamming = 6)
          .select($"media_id", $"kind", md5($"content").as("content_md5"))
          .orderBy($"media_id")
      },
      Some {
        val pair = bandedPairDomCtes("",
          stubBandExprs("text", "len").mkString("[", ", ", "]"), 6)
        s"""WITH am AS (
              SELECT doc_id AS media_id,
                     ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
                     text, length(text) AS len
              FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS media_id, 'image' AS kind,
                     text, length(text) AS len
              FROM documents WHERE doc_id % 3 = 0 AND doc_id < 30),
            ${applySurvivorCtes("", "am", "image", pair)}
            SELECT media_id, kind, md5(text) AS content_md5
            FROM out ORDER BY media_id"""
      }),

    // Audio near-dup pairs by banded energy-delta fingerprint (see
    // audioFingerprintPairs): the first ten audio payloads are
    // re-ingested under shifted ids so every scale has deterministic
    // positives, and the oracle computes the NAIVE all-pairs hamming
    // over the same stub fingerprint — the banded plan must reproduce
    // it exactly, so candidate completeness is what the hash-compare
    // checks. The real-codec form (WavCodec.fingerprint) is
    // spec-checked on WAV fixtures, including gain invariance.
    QueryDef(
      "mm_audio_pairs",
      (s, d) => {
        import s.implicits._
        val base = synthesize(s, d).toDF()
        val replayed = base
          .filter($"kind" === "audio" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        audioFingerprintPairs(base.unionByName(replayed), maxHamming = 6)
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val bands = audioBandExprs("text", "len").mkString("[", ", ", "]")
        val ham = (1 to 8)
          .map(i => s"CAST(bit_count(xor(a.bands[$i], c.bands[$i])) AS INT)")
          .mkString(" + ")
        s"""WITH m AS (
              SELECT doc_id AS media_id, text, length(text) AS len
              FROM documents WHERE doc_id % 3 = 1 AND length(text) >= 1
              UNION ALL
              SELECT doc_id + 1000000 AS media_id, text, length(text) AS len
              FROM documents
              WHERE doc_id % 3 = 1 AND doc_id < 30 AND length(text) >= 1),
            b AS (SELECT media_id, $bands AS bands FROM m)
            SELECT a.media_id AS id_a, c.media_id AS id_b,
                   CAST($ham AS INT) AS hamming
            FROM b a JOIN b c ON a.media_id < c.media_id
            WHERE $ham <= 6
            ORDER BY id_a, id_b"""
      }),

    // Applied audio dedup: the survivor transform over the audio
    // fingerprint graph, completing the family symmetry (text,
    // embedding, image, and audio each ship detector AND transform).
    // Same replayed-copies corpus as mm_audio_pairs; oracle replays
    // collapse window, naive all-pairs hamming over eligible reps,
    // twin rule, and the final anti-join.
    QueryDef(
      "mm_apply_audio",
      (s, d) => {
        import s.implicits._
        val base = synthesize(s, d).toDF()
        val replayed = base
          .filter($"kind" === "audio" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        applyAudioSurvivors(base.unionByName(replayed), maxHamming = 6)
          .select($"media_id", $"kind", md5($"content").as("content_md5"))
          .orderBy($"media_id")
      },
      Some {
        val pair = bandedPairDomCtes("",
          audioBandExprs("text", "len").mkString("[", ", ", "]"), 6)
        s"""WITH am AS (
              SELECT doc_id AS media_id,
                     ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
                     text, length(text) AS len
              FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS media_id, 'audio' AS kind,
                     text, length(text) AS len
              FROM documents WHERE doc_id % 3 = 1 AND doc_id < 30),
            ${applySurvivorCtes("", "am", "audio", pair)}
            SELECT media_id, kind, md5(text) AS content_md5
            FROM out
            ORDER BY media_id"""
      }),

    // Video near-dup by shared sampled frames (see videoFramePairs):
    // the first ten videos re-ingest under shifted ids (identical
    // frames -> each copy shares ALL its sampled frames with its
    // original), and the oracle replays the mm_frames chunk
    // arithmetic, per-frame md5, and the pair counting verbatim. The
    // replayed rows keep the ORIGINAL doc's n_frames (the synthesize
    // column rides the copied row), mirrored in the oracle's nf.
    QueryDef(
      "mm_video_pairs",
      (s, d) => {
        import s.implicits._
        val base = synthesize(s, d).toDF()
        val replayed = base
          .filter($"kind" === "video" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        videoFramePairs(base.unionByName(replayed), minShared = 2)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id, text, length(text) AS len,
                       (doc_id % 30 + 1) AS nf
                FROM documents WHERE doc_id % 3 = 2 AND length(text) >= 1
                UNION ALL
                SELECT doc_id + 1000000 AS media_id, text, length(text) AS len,
                       (doc_id % 30 + 1) AS nf
                FROM documents
                WHERE doc_id % 3 = 2 AND doc_id < 30 AND length(text) >= 1),
              f AS (
                SELECT media_id, text, len, nf, greatest(len // nf, 1) AS fl
                FROM m),
              ch AS (
                SELECT media_id, md5(sub) AS fh
                FROM (SELECT media_id, substring(text, x * fl + 1, fl) AS sub
                      FROM (SELECT *, unnest(range(0, nf, 3)) AS x FROM f))
                WHERE length(sub) > 0),
              p AS (SELECT DISTINCT media_id, fh FROM ch),
              sz AS (SELECT media_id, count(*) AS nh FROM p GROUP BY media_id),
              pr AS (
                SELECT a.media_id AS id_a, b.media_id AS id_b,
                       count(*) AS n_shared
                FROM p a JOIN p b ON a.fh = b.fh AND a.media_id < b.media_id
                GROUP BY 1, 2)
              SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
                     CAST(sa.nh AS BIGINT) AS nh_a, CAST(sb.nh AS BIGINT) AS nh_b
              FROM pr
              JOIN sz sa ON sa.media_id = pr.id_a
              JOIN sz sb ON sb.media_id = pr.id_b
              WHERE n_shared >= 2
              ORDER BY id_a, id_b""")),

    // Applied video dedup: keep-first survivors over the shared-frame
    // graph — detector AND transform for all three media kinds. The
    // oracle replays the collapse window, the frame-hash pair counts
    // over eligible reps, the twin rule (a content twin falls with its
    // rep even below the pair threshold), and the final anti-join.
    QueryDef(
      "mm_apply_video",
      (s, d) => {
        import s.implicits._
        val base = synthesize(s, d).toDF()
        val replayed = base
          .filter($"kind" === "video" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
        applyVideoSurvivors(base.unionByName(replayed), minShared = 2)
          .select($"media_id", $"kind", md5($"content").as("content_md5"))
          .orderBy($"media_id")
      },
      Some(s"""WITH am AS (
                SELECT doc_id AS media_id,
                       ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
                       text, length(text) AS len, (doc_id % 30 + 1) AS nf
                FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS media_id, 'video' AS kind,
                       text, length(text) AS len, (doc_id % 30 + 1) AS nf
                FROM documents WHERE doc_id % 3 = 2 AND doc_id < 30),
              ${applySurvivorCtes("", "am", "video", framePairDomCtes("", 2))}
              SELECT media_id, kind, md5(text) AS content_md5
              FROM out ORDER BY media_id""")),

    // PERCEPTUAL video near-dup (see videoPhashPairs): the first ten
    // videos re-ingest RE-ENCODED — every byte shifted one code point
    // by an order-preserving translate (the stub's gain/brightness
    // shift) — so every frame md5 differs from its original (the
    // exact-frame detector finds nothing, spec-held) while every
    // frame dHash is bit-identical, and each copy pairs its original
    // with n_shared = nh at hamming 0. The oracle computes the NAIVE
    // all-frame-pairs hamming over the same per-frame dHash, so the
    // banded plan's candidate completeness is what the hash-compare
    // checks.
    QueryDef(
      "mm_video_pairs_phash",
      (s, d) => {
        import s.implicits._
        val base = synthesize(s, d).toDF()
        val reencoded = base
          .filter($"kind" === "video" && $"media_id" < 30)
          .withColumn("media_id", $"media_id" + 1000000L)
          .withColumn("content", encode(
            translate(decode($"content", "UTF-8"), ReencodeFrom, ReencodeTo),
            "UTF-8"))
        videoPhashPairs(base.unionByName(reencoded), maxHamming = 6, minShared = 2)
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val bands = stubBandExprs("sub", "slen").mkString("[", ", ", "]")
        val ham = (1 to 8)
          .map(i => s"CAST(bit_count(xor(a.bands[$i], b.bands[$i])) AS INT)")
          .mkString(" + ")
        val sqlFrom = ReencodeFrom.replace("'", "''")
        val sqlTo = ReencodeTo.replace("'", "''")
        s"""WITH m AS (
              SELECT doc_id AS media_id, text, length(text) AS len,
                     (doc_id % 30 + 1) AS nf
              FROM documents WHERE doc_id % 3 = 2 AND length(text) >= 1
              UNION ALL
              SELECT doc_id + 1000000 AS media_id,
                     translate(text, '$sqlFrom', '$sqlTo') AS text,
                     length(text) AS len, (doc_id % 30 + 1) AS nf
              FROM documents
              WHERE doc_id % 3 = 2 AND doc_id < 30 AND length(text) >= 1),
            f AS (
              SELECT media_id, text, len, nf, greatest(len // nf, 1) AS fl
              FROM m),
            ch AS (
              SELECT media_id, sub, length(sub) AS slen
              FROM (SELECT media_id, substring(text, x * fl + 1, fl) AS sub
                    FROM (SELECT *, unnest(range(0, nf, 3)) AS x FROM f))
              WHERE length(sub) > 0),
            bd AS (SELECT media_id, $bands AS bands FROM ch),
            p AS (SELECT DISTINCT media_id, bands FROM bd),
            sz AS (SELECT media_id, count(*) AS nh FROM p GROUP BY media_id),
            mt AS (
              SELECT a.media_id AS id_a, b.media_id AS id_b,
                     array_to_string(list_transform(a.bands,
                       v -> CAST(v AS VARCHAR)), '-') AS fpk_a
              FROM p a JOIN p b ON a.media_id < b.media_id
              WHERE $ham <= 6),
            pr AS (
              SELECT id_a, id_b, count(DISTINCT fpk_a) AS n_shared
              FROM mt GROUP BY 1, 2)
            SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
                   CAST(sa.nh AS BIGINT) AS nh_a, CAST(sb.nh AS BIGINT) AS nh_b
            FROM pr
            JOIN sz sa ON sa.media_id = pr.id_a
            JOIN sz sb ON sb.media_id = pr.id_b
            WHERE n_shared >= 2
            ORDER BY id_a, id_b"""
      })
  )
}
