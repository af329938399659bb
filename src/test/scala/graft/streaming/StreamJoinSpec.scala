package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join (engine-added streaming capability):
  * purchases enriched with the error events that follow within 10
  * minutes, watermarks bounding both sides' state. */
class StreamJoinSpec extends AnyFunSuite with SparkSpec {

  private def t(minutes: Int) = new java.sql.Timestamp(minutes * 60000L)

  test("watermarked interval join across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val errors = MemoryStream[Ev]
    val p = purchases.toDF()
      .select($"user_id", $"ts".as("p_ts"), $"value".as("p_value"))
      .withWatermark("p_ts", "30 minutes")
    val e = errors.toDF()
      .select($"user_id".as("e_user"), $"ts".as("e_ts"))
      .withWatermark("e_ts", "30 minutes")
    val joined = p.join(e,
      $"user_id" === $"e_user" &&
        $"e_ts" >= $"p_ts" && $"e_ts" <= $"p_ts" + expr("interval 10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      purchases.addData(Ev(t(10), "purchase", 100.0, 1), Ev(t(10), "purchase", 50.0, 2))
      errors.addData(Ev(t(15), "error", 0.0, 1)) // within 10m of user 1's purchase
      q.processAllAvailable()
      errors.addData(Ev(t(40), "error", 0.0, 2)) // 30m after user 2's purchase: outside
      q.processAllAvailable()
      val got = spark.table("ssj").select($"user_id", $"p_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((1L, 100.0)))
    } finally q.stop()
  }
}
