package graft.streaming

import graft.SparkSpec
import graft.streaming.Cadence.{DueSample, Tick}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole reference daemon composed end to end from engine parts:
  * modbus-sim DataSource V2 (D1) -> decode/convert (D3/D4) ->
  * per-channel cadence gate (D2) — one streaming pipeline, replayed
  * deterministically. */
class FullPipelineSpec extends AnyFunSuite with SparkSpec {

  test("source -> decode -> cadence gate composes as one streaming plan") {
    import spark.implicits._
    // device tick every 2s; channel 1 polls at 3s (timing): ticks at
    // t=2,4,6,8 -> due at 2 (first), 6 (gap 4 > 3), not 4/8 (gap 2)
    val readings = spark.readStream
      .format("modbus-sim")
      .option("channels", "1@11")
      .option("periodSec", "2")
      .option("maxTicks", "4")
      .load()
    val channels = Seq((1L, 4, 0L)).toDF("id", "format_code", "conversion_id")
    val decoded = Ingest.decodeAndConvert(readings, channels, Seq.empty)
    val ticks = decoded.select(
        $"channel_id",
        (unix_timestamp($"ts") * 1000).as("ts_ms"),
        lit(3000L).as("timing_ms"),
        $"value".cast("double").as("value"))
      .as[Tick]
    val gated = Cadence.dueFilter(ticks)
    val q = gated.writeStream.format("memory").queryName("full_pipe")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("full_pipe").as[DueSample].collect().sortBy(_.ts_ms)
      assert(got.map(_.ts_ms).toSeq == Seq(2000L, 6000L))
      assert(got.forall(_.value == 11.0)) // hr[11] == 11 golden value
    } finally q.stop()
  }
}
