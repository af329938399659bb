package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

case class BlInDoc(doc_id: Long, text: String)

/** [[Batching]] — online length-banded batch assignment. Pins (1) a
  * real StreamingQuery emitting the identical assignment to the batch
  * form when arrivals replay in id order across micro-batches (the
  * per-band counters must CONTINUE across batch boundaries, not
  * reset), and (2) the counter state surviving a kill/restart on the
  * RocksDB production backend with arrivals landing while the query
  * is down. */
class StreamBatchingSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def naive(docs: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val in = docs.select($"doc_id",
        size(graft.ops.TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("len_band", least(expr("n_tokens div 64"), lit(16L)))
    in.withColumn("rib",
        row_number().over(Window.partitionBy($"len_band").orderBy($"doc_id")))
      .withColumn("batch", expr("(rib - 1) div 32"))
      .select($"doc_id", $"n_tokens", $"len_band", $"batch").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  private def keyed(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] =
    df.select(col("doc_id"), col("n_tokens"), col("len_band"), col("batch"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("streamed batch assignment == batch form == per-band window across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val rows = docs.select($"doc_id", $"text").as[BlInDoc]
      .collect().sortBy(_.doc_id)

    val in = MemoryStream[BlInDoc]
    val q = Batching.withOnlineBatches(in.toDF(), $"doc_id", $"text")
      .toDF()
      .writeStream.format("memory").queryName("w_batching_stream")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = keyed(spark.table("w_batching_stream"))
      val batch = keyed(Batching.withOnlineBatches(docs, $"doc_id", $"text").toDF())
      val want = naive(docs)
      assert(want.nonEmpty && got == want, "stream != naive window")
      assert(batch == want, "batch replay != naive window")
      // the counters must have CONTINUED across micro-batches: at
      // least one band spans a chunk boundary with a batch index > 0
      assert(got.values.exists(_._3 > 0), "no band ever filled a batch")
    } finally q.stop()
  }

  test("sharded form: streamed == batch replay == per-(band, shard) window; shards genuinely split bands") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val shards = 4
    def naiveSharded(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long, Long)] = {
      val in = df.select($"doc_id",
          size(graft.ops.TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))
        .withColumn("len_band", least(expr("n_tokens div 64"), lit(16L)))
        .withColumn("shard",
          graft.functions.PortableHash.md5Hash60($"doc_id".cast("string")) % shards.toLong)
      in.withColumn("rib", row_number().over(
          Window.partitionBy($"len_band", $"shard").orderBy($"doc_id")))
        .withColumn("batch", expr("(rib - 1) div 32"))
        .select($"doc_id", $"n_tokens", $"len_band", $"shard", $"batch").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
    }
    def keyed5(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_tokens", $"len_band", $"shard", $"batch").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val rows = docs.select($"doc_id", $"text").as[BlInDoc].collect().sortBy(_.doc_id)
    val in = MemoryStream[BlInDoc]
    val q = Batching.withOnlineBatchesSharded(in.toDF(), $"doc_id", $"text",
        shards = shards)
      .toDF()
      .writeStream.format("memory").queryName("w_batching_sharded_stream")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = keyed5(spark.table("w_batching_sharded_stream"))
      val batch = keyed5(Batching.withOnlineBatchesSharded(
        docs, $"doc_id", $"text", shards = shards).toDF())
      val want = naiveSharded(docs)
      assert(want.nonEmpty && got == want, "sharded stream != naive window")
      assert(batch == want, "sharded batch replay != naive window")
      // sharding must actually split at least one band across shards,
      // or the fixture proves nothing about per-shard numbering
      val perBandShards = want.values.groupBy(_._2).map { case (_, vs) =>
        vs.map(_._3).toSet.size }
      assert(perBandShards.exists(_ > 1), "no band split across shards")
    } finally q.stop()
  }

  test("per-band counters on RocksDB: kill/restart mid-stream, assignment == batch form") {
    import spark.implicits._
    val rocksCls =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rocksCls)
    try {
      val dir = Files.createTempDirectory("graft_rocks_batch").toString
      val (inDir, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")
      val docs = graft.model.Tables.table(spark, sf, "documents")
      val rows = docs.select($"doc_id", $"text").as[(Long, String)]
        .collect().sortBy(_._1)
      val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      def land(chunk: Seq[(Long, String)]): Unit =
        chunk.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)

      land(chunks(0))
      val schema = spark.read.parquet(inDir).schema
      def start() = Batching.withOnlineBatches(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir),
          $"doc_id", $"text")
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      q1.processAllAvailable()
      assert(q1.lastProgress != null && q1.lastProgress.stateOperators.nonEmpty)
      assert(spark.conf.get(key) == rocksCls)
      land(chunks(1))
      q1.processAllAvailable()
      q1.stop() // kill: the counters live only in the RocksDB checkpoint

      land(chunks(2)) // arrivals while the query is down
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      // recovered counters must CONTINUE (a reset would re-number the
      // post-restart slice from batch 0 and collide with chunk 0's)
      val got = keyed(spark.read.parquet(out))
      val want = naive(docs)
      assert(got == want,
        s"RocksDB recovery diverged: ${(want.toSet -- got.toSet).take(3)} " +
          s"vs ${(got.toSet -- want.toSet).take(3)}")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
