package graft.streaming

import graft.streaming.Ingest.RegisterReading
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Runnable end-to-end demo of the ingestion pipeline: feeds register
  * readings through the streaming decode/convert/persist path and
  * prints the resulting fact and status tables. Usage:
  *   sbt "runMain graft.streaming.IngestDemo /tmp/graft_demo"
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_demo")
    val spark = graft.model.Tables.withSessionDefaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // channel dim: ch1 = UINT16 scaled x10 keep 2; ch2 = FLOAT raw keep 10
    val channels = Seq((1L, 4, 1L, 2), (2L, 7, 0L, 10))
      .toDF("id", "format_code", "conversion_id", "history_len")
    val convs = Seq(1L -> "Value = x * 10")

    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[RegisterReading]
    val q = Ingest.start(mem.toDF(), channels, convs,
      s"$out/fact", s"$out/status", s"$out/ckpt")
    mem.addData(
      RegisterReading(1L, ts(10), Seq(5, 0, 0, 0), 0),
      RegisterReading(2L, ts(10), Seq(0x0000, 0x3FC0), 0),
      RegisterReading(1L, ts(12), Seq(6, 0, 0, 0), -1))
    q.processAllAvailable()
    mem.addData(
      RegisterReading(1L, ts(20), Seq(9, 0, 0, 0), 0),
      RegisterReading(1L, ts(30), Seq(11, 0, 0, 0), 0))
    q.processAllAvailable()
    q.stop()

    println("=== channel_data (fact) after 2 micro-batches ===")
    Ingest.readFact(spark, s"$out/fact").orderBy("channel_id", "ts").show(false)
    println("=== daq_status (keyed upsert) ===")
    spark.read.parquet(s"$out/status").orderBy("parameter").show(false)
    // independent heartbeat stream (D10): pulse once, show the upsert
    val hb = Ingest.startHeartbeat(spark, s"$out/hb_status", periodSec = 1)
    Thread.sleep(3000); hb.stop()
    println("=== heartbeat status (independent of data) ===")
    spark.read.parquet(s"$out/hb_status").show(false)
    Ingest.compactFact(spark, s"$out/fact", channels)
    println("=== fact after retention compaction (ch1 keeps 2) ===")
    Ingest.readFact(spark, s"$out/fact").orderBy("channel_id", "ts").show(false)
    spark.stop()
  }
}
