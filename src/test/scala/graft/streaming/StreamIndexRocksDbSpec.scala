package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The online index family under the PRODUCTION state backend: a real
  * StreamingQuery holding the near-dup band index in the RocksDB state
  * store, killed mid-stream and resumed from its checkpoint. This is
  * the deployment shape every heap-guard message and 100× caveat
  * points at ("a streaming deployment holds the same state in the
  * state store") — previously only ConfigStoreSpec exercised RocksDB;
  * this spec pins the INDEX family on it: multi-micro-batch arrival,
  * kill/restart recovery, and the emitted pair set equal to the batch
  * oracle run on the same corpus. */
class StreamIndexRocksDbSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val rocksCls =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run body with the RocksDB provider set on the shared session,
    * restoring the previous provider after. */
  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rocksCls)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("near-dup index on RocksDB: kill/restart mid-stream, pair set == batch oracle run") {
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_rocks_idx").toString
      val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")

      // id-ordered arrival in 3 file batches -> stream pair orientation
      // matches the batch run (same convention as StreamNearDupSpec)
      val docs = graft.model.Tables.table(spark, sf, "documents")
        .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
      val chunks = docs.grouped((docs.length + 2) / 3).toSeq
      assert(chunks.length == 3)
      def land(chunk: Seq[(Long, String)]): Unit =
        chunk.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)

      land(chunks(0))
      val schema = spark.read.parquet(in).schema
      def start() = NearDup
        .nearDupPairs(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(in),
          $"doc_id", $"text", 0.5)
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      q1.processAllAvailable()
      // the band index is a stateful operator and the store is RocksDB
      val progress = q1.lastProgress
      assert(progress != null && progress.stateOperators.nonEmpty,
        "expected the band-index stateful operator")
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == rocksCls)
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop() // kill mid-stream: band state lives only in the checkpoint

      // the last chunk lands while the query is down
      land(chunks(2))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      // recovery must neither lose state (pairs spanning the kill
      // still emit) nor replay state (no duplicate beyond the
      // per-shared-band emission the operator documents)
      val got = spark.read.parquet(out)
        .select($"id_a", $"id_b").distinct()
        .as[(Long, Long)].collect().toSet
      val expect = NearDup
        .nearDupPairs(
          graft.model.Tables.table(spark, sf, "documents"),
          $"doc_id", $"text", 0.5)
        .toDF().select($"id_a", $"id_b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(expect.nonEmpty, "corpus must produce near-dup pairs")
      assert(got == expect,
        s"RocksDB recovery diverged: missing=${(expect -- got).take(5)} " +
          s"extra=${(got -- expect).take(5)}")
    }
  }

  test("AGED near-dup index on RocksDB: EventTimeTimeout state survives restart on the retained window") {
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_rocks_aged").toString
      val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")

      // synthesized monotone ts (epoch + 1e6 + id seconds; clear of
      // epoch 0 — the initial watermark is 0 and the stateful operator
      // filters rows at-or-behind it as late) — the aged-oracle trick:
      // the aged pair set is exactly the unaged set filtered by
      // id_b - id_a <= horizon seconds
      val horizonSec = 60L
      val docs = graft.model.Tables.table(spark, sf, "documents")
        .select($"doc_id", $"text",
          timestamp_seconds(lit(1000000L) + $"doc_id").as("ts"))
      val rows = docs.as[(Long, String, java.sql.Timestamp)]
        .collect().sortBy(_._1)
      val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      def land(chunk: Seq[(Long, String, java.sql.Timestamp)]): Unit =
        chunk.toDF("doc_id", "text", "ts").coalesce(1)
          .write.mode("append").parquet(in)

      land(chunks(0))
      val schema = spark.read.parquet(in).schema
      def start() = {
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(in)
          .withWatermark("ts", "10 seconds")
        NearDup.nearDupPairs(src, $"doc_id", $"text", 0.5,
            aging = Some(NearDup.Aging($"ts", horizonSec * 1000)))
          .toDF()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).outputMode("append").start()
      }

      val q1 = start()
      q1.processAllAvailable()
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop()
      land(chunks(2))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(out)
        .select($"id_a", $"id_b").distinct()
        .as[(Long, Long)].collect().toSet
      val expect = NearDup
        .nearDupPairs(
          graft.model.Tables.table(spark, sf, "documents"),
          $"doc_id", $"text", 0.5)
        .toDF()
        .filter($"id_b" - $"id_a" <= horizonSec)
        .select($"id_a", $"id_b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(expect.nonEmpty, "horizon must retain some pairs")
      assert(got == expect,
        s"aged RocksDB recovery diverged: missing=${(expect -- got).take(5)} " +
          s"extra=${(got -- expect).take(5)}")
    }
  }

  /** The COMPOSED media corpus of the w_media query family: synthetic
    * media plus the first-30 replays — the corpus whose drop set the
    * batch form oracles. */
  private def mediaCorpus = {
    import spark.implicits._
    val base = graft.ops.Multimodal.synthesize(spark, sf).toDF()
    val replayed = base.filter($"media_id" < 30)
      .withColumn("media_id", $"media_id" + 1000000L)
    base.unionByName(replayed)
  }

  test("composed media sum-type state on RocksDB: kill/restart, drop set == batch run") {
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_rocks_media").toString
      val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")

      // id-ordered arrival (the batch form's keep-first orientation)
      val rows = mediaCorpus.collect().sortBy(_.getLong(0))
      val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      val schema = mediaCorpus.schema
      def land(chunk: Seq[org.apache.spark.sql.Row]): Unit =
        spark.createDataFrame(
          spark.sparkContext.parallelize(chunk, 1), schema)
          .coalesce(1).write.mode("append").parquet(in)

      land(chunks(0))
      def start() = NearDup
        .mediaDroppedByIndex(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(in))
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      q1.processAllAvailable()
      assert(q1.lastProgress != null && q1.lastProgress.stateOperators.nonEmpty,
        "expected the sum-type media-band stateful operator")
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop() // kill: the kind-prefixed sum-type state lives only in RocksDB
      land(chunks(2))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(out)
        .select($"media_id").distinct().as[Long].collect().toSet
      val expect = NearDup.mediaDroppedByIndex(mediaCorpus)
        .toDF().select($"media_id").distinct().as[Long].collect().toSet
      assert(expect.nonEmpty, "replayed media must produce drops")
      assert(got == expect,
        s"media RocksDB recovery diverged: missing=${(expect -- got).take(5)} " +
          s"extra=${(got -- expect).take(5)}")
    }
  }

  test("AGED composed media state on RocksDB: EventTimeTimeout sum-type state survives restart") {
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_rocks_media_aged").toString
      val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")

      // w_media_aged's varying-gap scheme: replays land 11 s/id behind
      // their originals; horizon 150 s splits them deterministically
      val base = graft.ops.Multimodal.synthesize(spark, sf).toDF()
      val nat = base
        .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id"))
      val rep = base.filter($"media_id" < 30)
        .withColumn("ets", timestamp_seconds(lit(1000000L) + $"media_id" * 11))
        .withColumn("media_id", $"media_id" + 1000000L)
      val corpus = nat.unionByName(rep)
      val schema = corpus.schema
      // event-time-ordered arrival, ties by id — watermark-safe
      val rows = corpus.collect()
        .sortBy(r => (r.getTimestamp(r.fieldIndex("ets")).getTime, r.getLong(0)))
      val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      def land(chunk: Seq[org.apache.spark.sql.Row]): Unit =
        spark.createDataFrame(
          spark.sparkContext.parallelize(chunk, 1), schema)
          .coalesce(1).write.mode("append").parquet(in)

      land(chunks(0))
      def start() = NearDup
        .mediaDroppedByIndex(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(in)
            .withWatermark("ets", "10 seconds"),
          aging = Some(NearDup.Aging($"ets", 150000L)))
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      q1.processAllAvailable()
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop()
      land(chunks(2))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(out)
        .select($"media_id").distinct().as[Long].collect().toSet
      val expect = NearDup.mediaDroppedByIndex(corpus,
          aging = Some(NearDup.Aging($"ets", 150000L)))
        .toDF().select($"media_id").distinct().as[Long].collect().toSet
      assert(expect.nonEmpty, "horizon must retain some media drops")
      assert(got == expect,
        s"aged media RocksDB recovery diverged: missing=${(expect -- got).take(5)} " +
          s"extra=${(got -- expect).take(5)}")
    }
  }

  test("stream-stream interval join on RocksDB: kill/restart mid-stream, matches == batch twin") {
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_rocks_ssj").toString
      val (inP, inC, out, ckpt) = (s"$dir/inp", s"$dir/inc", s"$dir/out", s"$dir/ckpt")

      // event-time-ordered arrival in 3 file batches on EACH side; the
      // 48h lateness keeps every click within 24h of a future purchase
      // alive in the join state across chunk boundaries AND the kill
      val events = graft.model.Tables.table(spark, sf, "events")
        .select($"event_id", $"ts", $"event_type", $"user_id")
        .as[(Long, java.sql.Timestamp, String, Long)].collect().sortBy(_._2.getTime)
      val chunks = events.grouped((events.length + 2) / 3).toSeq
      assert(chunks.length == 3)
      def land(chunk: Seq[(Long, java.sql.Timestamp, String, Long)]): Unit = {
        val df = chunk.toDF("event_id", "ts", "event_type", "user_id").coalesce(1)
        df.write.mode("append").parquet(inP)
        df.write.mode("append").parquet(inC)
      }

      land(chunks(0))
      val schema = spark.read.parquet(inP).schema
      def start() = Windows.purchaseClickJoinStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inP),
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inC),
        "24 hours", "48 hours")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      q1.processAllAvailable()
      val progress = q1.lastProgress
      assert(progress != null && progress.stateOperators.nonEmpty,
        "expected the stream-stream join's stateful operator")
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop() // kill mid-stream: both sides' join state only in the checkpoint

      land(chunks(2))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      // cross-kill matches (purchase in chunk 2, click buffered before
      // the kill) must emit exactly once from the recovered state
      val got = spark.read.parquet(out)
        .select($"purchase_id", $"click_id")
        .as[(Long, Long)].collect().toSeq
      assert(got.size == got.distinct.size, "a recovered match emitted twice")
      val ev = graft.model.Tables.table(spark, sf, "events")
      val want = Windows.purchaseClickJoin(
        Windows.purchaseSide(ev), Windows.clickSide(ev), "24 hours")
        .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
      assert(want.nonEmpty)
      assert(got.toSet == want)
    }
  }

  test("stored-ANN serve under a checkpoint-restarted StreamingQuery == batch serve") {
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_rocks_annstored").toString
      val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")

      // the production cycle: coded artifact dumped + reloaded, index
      // collected from the PARQUET frame (no build lineage), served
      // against a restartable stream of query vectors
      val emb = graft.model.Tables.table(spark, sf, "embeddings")
      val root = s"$dir/index"
      graft.ops.IndexStore.save(root,
        "ann_codes" -> AnnServe.codedFrame(emb, $"vec_id", $"embedding"))
      val idx = AnnServe.annIndexFromFrame(
        graft.ops.IndexStore.load(spark, root, "ann_codes"))

      val queries = emb.filter($"vec_id" < 20)
        .select($"vec_id", $"embedding")
      val schema = queries.schema
      val rows = queries.collect().sortBy(_.getLong(0))
      val chunks = rows.grouped(7).toSeq
      def land(chunk: Seq[org.apache.spark.sql.Row]): Unit =
        spark.createDataFrame(
          spark.sparkContext.parallelize(chunk, 1), schema)
          .coalesce(1).write.mode("append").parquet(in)

      land(chunks(0))
      def start() = AnnServe
        .withOnlineAnn(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(in),
          $"vec_id", $"embedding", idx, k = 5)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      q1.processAllAvailable()
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop() // kill between micro-batches; source offsets live in the checkpoint
      chunks.drop(2).foreach(c => land(c.toSeq))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      val got = spark.read.parquet(out).collect().map(key).toSet
      val expect = AnnServe
        .withOnlineAnn(emb.filter($"vec_id" < 20), $"vec_id", $"embedding",
          idx, k = 5)
        .collect().map(key).toSet
      assert(expect.size == 20 * 5)
      assert(got == expect,
        s"stored-ANN streaming restart diverged: missing=${(expect -- got).take(5)} " +
          s"extra=${(got -- expect).take(5)}")
    }
  }

  test("SemDeDup cell index on RocksDB: kill/restart mid-stream, survivor set == batch replay") {
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_rocks_semdd").toString
      val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")

      // frozen quantizer trained offline on the full corpus — the
      // production cycle w_semdedup documents (train once, serve the
      // stream against the broadcast centroids)
      val emb = graft.model.Tables.table(spark, sf, "embeddings")
        .select($"vec_id", $"embedding")
      val cents = NearDup.collectCentroids(graft.ops.Similarity.kmeansCents(
        emb.select($"vec_id",
          graft.ops.Similarity.asDouble($"embedding").as("v"))))

      // id-ordered arrival in 3 file batches, incl. a verbatim twin of
      // vec 0 landing AFTER the kill — its drop requires the cell
      // index recovered from RocksDB to still hold vec 0
      val rows = emb.as[(Long, Seq[Float])].collect().sortBy(_._1)
      val twin = (1000000L, rows.find(_._1 == 0L).get._2)
      val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      assert(chunks.length == 3)
      def land(chunk: Seq[(Long, Seq[Float])]): Unit =
        chunk.toDF("vec_id", "embedding").coalesce(1)
          .write.mode("append").parquet(in)

      land(chunks(0))
      val schema = spark.read.parquet(in).schema
      def start() = NearDup
        .semDedupOnline(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(in),
          $"vec_id", $"embedding", cents, 0.4)
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      q1.processAllAvailable()
      val progress = q1.lastProgress
      assert(progress != null && progress.stateOperators.nonEmpty,
        "expected the cell-index stateful operator")
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop() // kill mid-stream: the cell index lives only in RocksDB

      land(chunks(2) :+ twin)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(out).select($"vec_id", $"cell")
        .as[(Long, Long)].collect().toSet
      val expect = NearDup.semDedupOnline(
          (rows :+ twin).toSeq.toDF("vec_id", "embedding"),
          $"vec_id", $"embedding", cents, 0.4)
        .toDF().select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
      assert(expect.nonEmpty)
      assert(!got.exists(_._1 == 1000000L),
        "post-restart twin survived: the recovered cell index lost vec 0")
      assert(got == expect,
        s"SemDeDup RocksDB recovery diverged: missing=${(expect -- got).take(5)} " +
          s"extra=${(got -- expect).take(5)}")
    }
  }

  test("AGED SemDeDup cell index on RocksDB: EventTimeTimeout state survives restart on the retained window") {
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_rocks_semdda").toString
      val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")

      val emb = graft.model.Tables.table(spark, sf, "embeddings")
        .select($"vec_id", $"embedding")
      val cents = NearDup.collectCentroids(graft.ops.Similarity.kmeansCents(
        emb.select($"vec_id",
          graft.ops.Similarity.asDouble($"embedding").as("v"))))

      // synthesized monotone ts (epoch + 1e6 + vec_id seconds) with
      // the w_semdedup_aged horizon: a vector only falls to cell-mates
      // within 150 s before it
      val horizonMs = 150000L
      val rows = emb
        .withColumn("ets", timestamp_seconds(lit(1000000L) + $"vec_id"))
        .as[(Long, Seq[Float], java.sql.Timestamp)].collect().sortBy(_._1)
      val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      def land(chunk: Seq[(Long, Seq[Float], java.sql.Timestamp)]): Unit =
        chunk.toDF("vec_id", "embedding", "ets").coalesce(1)
          .write.mode("append").parquet(in)

      land(chunks(0))
      val schema = spark.read.parquet(in).schema
      // no source-side watermark: the operator re-declares it from
      // Aging.lateness (its typed cell-assignment map severs
      // event-time propagation — the contract its scaladoc pins)
      def start() = NearDup
        .semDedupOnline(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(in),
          $"vec_id", $"embedding", cents, 0.4,
          aging = Some(NearDup.Aging($"ets", horizonMs)))
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      q1.processAllAvailable()
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop()
      land(chunks(2))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(out).select($"vec_id", $"cell")
        .as[(Long, Long)].collect().toSet
      val expect = NearDup.semDedupOnline(
          emb.withColumn("ets", timestamp_seconds(lit(1000000L) + $"vec_id")),
          $"vec_id", $"embedding", cents, 0.4,
          aging = Some(NearDup.Aging($"ets", horizonMs)))
        .toDF().select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
      assert(expect.nonEmpty)
      assert(got == expect,
        s"aged SemDeDup RocksDB recovery diverged: missing=${(expect -- got).take(5)} " +
          s"extra=${(got -- expect).take(5)}")
    }
  }
}
