package graft.streaming

import graft.SparkSpec
import graft.streaming.Ingest.RegisterReading
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end ingestion: registers in -> decoded, converted, persisted
  * samples + status upserts out, across micro-batches, exactly-once. */
class IngestSpec extends AnyFunSuite with SparkSpec {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def channelDim = {
    import spark.implicits._
    // (id, format_code, conversion_id, history_len):
    //   1: UINT16, conversion 1 (x*10), keep 1
    //   2: FLOAT,  no conversion (0),   keep 10
    Seq((1L, 4, 1L, 1), (2L, 7, 0L, 10))
      .toDF("id", "format_code", "conversion_id", "history_len")
  }
  private val convs = Seq(1L -> "Value = x * 10")

  test("full pipeline: decode, convert, append, upsert, compact, flush") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ingest").toString
    val (factDir, statusDir, ckpt) = (s"$dir/fact", s"$dir/status", s"$dir/ckpt")

    val mem = MemoryStream[RegisterReading]
    val q = Ingest.start(mem.toDF(), channelDim, convs, factDir, statusDir, ckpt)
    try {
      mem.addData(
        RegisterReading(1L, ts(10), Seq(5, 0, 0, 0), 0),        // uint16 5 -> x10 = 50
        RegisterReading(2L, ts(10), Seq(0x0000, 0x3FC0), 0),    // float 1.5
        RegisterReading(1L, ts(11), Seq(7, 0, 0, 0), -1))       // failed read: dropped
      q.processAllAvailable()
      mem.addData(
        RegisterReading(1L, ts(20), Seq(9, 0, 0, 0), 0))        // second sample ch1 -> 90
      q.processAllAvailable()
    } finally q.stop()

    val fact = Ingest.readFact(spark, factDir)
    val rows = fact.orderBy($"channel_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getDecimal(2).toPlainString))
    assert(rows.toSeq == Seq(
      (1L, 10L, "50.000000"),
      (1L, 20L, "90.000000"),
      (2L, 10L, "1.500000")))

    // status: latest per parameter + heartbeat (daq-3i.py:284, :163-171),
    // with the reference's surrogate id (db_model.py:58) stable per
    // parameter across upserts
    val status = spark.read.parquet(statusDir).orderBy($"parameter")
      .select($"id", $"parameter", $"status", $"ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getTimestamp(3).getTime / 1000))
    assert(status.toSeq == Seq(
      (1L, "CHL: 1", 1, 20L), (2L, "CHL: 2", 1, 10L), (3L, "daq-3i", 1, 20L)))

    // D9: compaction honors per-channel history_len (ch1 keeps 1 newest)
    Ingest.compactFact(spark, factDir, channelDim)
    val compacted = Ingest.readFact(spark, factDir).orderBy($"channel_id").collect()
      .map(r => (r.getLong(0), r.getDecimal(2).toPlainString))
    assert(compacted.toSeq == Seq((1L, "90.000000"), (2L, "1.500000")))

    // D8: status flush
    Ingest.flushStatus(spark, statusDir)
    assert(!new java.io.File(statusDir).exists())
  }

  test("runBackfill drains landed raw data via AvailableNow; re-run is a no-op") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_backfill").toString
    val (rawDir, factDir, statusDir, ckpt) =
      (s"$dir/raw", s"$dir/fact", s"$dir/status", s"$dir/ckpt")

    // land raw readings as parquet (schema = the modbus-sim source's)
    Seq(
      (1L, ts(10), Seq(5, 0, 0, 0), 0),     // uint16 5 -> x10 = 50
      (2L, ts(10), Seq(0x0000, 0x3FC0), 0), // float 1.5
      (1L, ts(11), Seq(7, 0, 0, 0), -1))    // failed read: dropped
      .toDF("channel_id", "ts", "registers", "status")
      .write.parquet(rawDir)

    Ingest.runBackfill(spark, rawDir, channelDim, convs, factDir, statusDir, ckpt)
    def factRows() = Ingest.readFact(spark, factDir)
      .orderBy($"channel_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getDecimal(2).toPlainString)).toSeq
    assert(factRows() == Seq((1L, "50.000000"), (2L, "1.500000")))

    // same checkpoint, unchanged raw dir -> nothing new lands
    Ingest.runBackfill(spark, rawDir, channelDim, convs, factDir, statusDir, ckpt)
    assert(factRows() == Seq((1L, "50.000000"), (2L, "1.500000")))

    // new raw file arrives -> only the delta is processed
    Seq((1L, ts(20), Seq(9, 0, 0, 0), 0))
      .toDF("channel_id", "ts", "registers", "status")
      .write.mode("append").parquet(rawDir)
    Ingest.runBackfill(spark, rawDir, channelDim, convs, factDir, statusDir, ckpt)
    assert(factRows() == Seq((1L, "50.000000"), (1L, "90.000000"), (2L, "1.500000")))
  }

  test("heartbeat pulses independently of data flow (daq-3i.py:163-171)") {
    val dir = Files.createTempDirectory("graft_hb").toString + "/status"
    val q = Ingest.startHeartbeat(spark, dir, periodSec = 1)
    try {
      val deadline = System.currentTimeMillis() + 30000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        rows =
          try spark.read.parquet(dir).select("parameter", "status").collect()
          catch { case _: Throwable => Array.empty }
      }
      assert(rows.nonEmpty, "no heartbeat within 30s")
      assert(rows.map(_.getString(0)).toSet == Set("daq-3i"))
      assert(rows.head.getInt(1) == 1)
    } finally q.stop()
  }

  test("recoverFactDir restores a half-swapped .bak before anything else writes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_recover").toString
    val factDir = s"$dir/fact"
    Seq((1L, ts(10), BigDecimal(50))).toDF("channel_id", "ts", "value")
      .write.parquet(s"$factDir/batch=b0")
    // simulate compactFact dying between its two renames: all data
    // sits in .bak, factDir is gone
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(factDir),
      new org.apache.hadoop.fs.Path(factDir + ".bak")))
    Ingest.recoverFactDir(spark, factDir)
    assert(Ingest.readFact(spark, factDir).count() == 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(factDir + ".bak")))
  }

  test("status upsert is last-writer-wins and idempotent across replays") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_status").toString + "/status"
    val b1 = Seq((1L, ts(10), BigDecimal(50))).toDF("channel_id", "ts", "value")
    Ingest.mergeStatus(spark, dir, Ingest.statusUpdates(b1, heartbeat = false))
    Ingest.mergeStatus(spark, dir, Ingest.statusUpdates(b1, heartbeat = false)) // replay
    val b2 = Seq((1L, ts(30), BigDecimal(60))).toDF("channel_id", "ts", "value")
    Ingest.mergeStatus(spark, dir, Ingest.statusUpdates(b2, heartbeat = false))
    val got = spark.read.parquet(dir).select("id", "parameter", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime / 1000))
    // id stable across the three merges (db_model.py:58 parity)
    assert(got.toSeq == Seq((1L, "CHL: 1", 30L)))
  }

  test("id-less legacy status table upgrades with deterministic backfilled ids") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_status_legacy").toString + "/status"
    // a statusDir written by the pre-surrogate-id engine: no id column
    Seq(("CHL: 2", 1, ts(10)), ("CHL: 1", 1, ts(10)), ("daq-3i", 1, ts(10)))
      .toDF("parameter", "status", "ts")
      .repartition(1).write.parquet(dir)
    val b = Seq((3L, ts(20), BigDecimal(5))).toDF("channel_id", "ts", "value")
    Ingest.mergeStatus(spark, dir, Ingest.statusUpdates(b, heartbeat = false))
    val got = spark.read.parquet(dir).select("id", "parameter").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._2)
    // legacy parameters backfilled in parameter order (not all id 0 via
    // null-unboxing); the new parameter takes the next id
    assert(got.map(_._1).distinct.length == got.length, s"duplicate ids: ${got.toSeq}")
    assert(got.toSeq == Seq((1L, "CHL: 1"), (2L, "CHL: 2"), (4L, "CHL: 3"), (3L, "daq-3i")))
  }

  test("status upsert at 100k parameters: distributed merge, stable dense ids") {
    // the scale case the driver-collect implementation would have
    // funneled through the driver: every stage here is a distributed
    // plan (range-partitioned zipWithIndex id assignment, join-based
    // id retention, write-aside swap) — the only driver-side values in
    // mergeStatus are a 1-row max(id) probe and the rename calls
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_status_100k").toString + "/status"
    def updates(n: Int, tsSec: Int, prefix: String = "P") =
      spark.range(n).select(
        format_string(prefix + "%07d", $"id").as("parameter"),
        lit(1).as("status"), lit(ts(tsSec)).as("ts"))
    Ingest.mergeStatus(spark, dir, updates(100000, 10))
    val first = spark.read.parquet(dir)
    assert(first.count() == 100000)
    // dense ids 1..100k in parameter order (zero-padded => numeric order)
    val probe = first.filter($"parameter".isin("P0000000", "P0099999"))
      .select($"parameter", $"id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probe == Map("P0000000" -> 1L, "P0099999" -> 100000L))
    // second merge: same parameters keep their ids; new ones extend
    Ingest.mergeStatus(spark, dir, updates(100, 20).unionAll(updates(10, 20, "Q")))
    val second = spark.read.parquet(dir)
    assert(second.count() == 100010)
    val again = second.filter($"parameter".isin("P0000000", "P0099999", "Q0000000"))
      .select($"parameter", $"id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again("P0000000") == 1L && again("P0099999") == 100000L)
    assert(again("Q0000000") == 100001L, s"new parameter id: ${again("Q0000000")}")
    assert(second.select($"id").distinct().count() == 100010)
  }
}
