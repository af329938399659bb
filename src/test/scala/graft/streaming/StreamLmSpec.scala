package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite


/** Streaming LM scoring: micro-batch replay == batch run, the JVM
  * shift-loop scorer == the batch column-algebra form, and
  * out-of-vocabulary arrivals score the frozen-model smoothing. */
class StreamLmSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))

  test("streaming LM scores across 3 micro-batches == batch run") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = LmServe.buildLmModel(docs, $"text")
    val arrivals = docs.filter($"doc_id" < 30)
      .select($"doc_id", $"text").as[Doc].collect().toSeq.sortBy(_.doc_id)

    val mem = MemoryStream[Doc]
    val q = LmServe.withOnlineLmScore(mem.toDF(), $"doc_id", $"text", model)
      .writeStream.format("memory").queryName("wlm").outputMode("append").start()
    try {
      arrivals.grouped(11).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("wlm").collect().map(key).toSet
      val batched = LmServe
        .withOnlineLmScore(docs.filter($"doc_id" < 30), $"doc_id", $"text", model)
        .collect().map(key).toSet
      assert(streamed == batched)
      assert(batched.size == 30)
    } finally q.stop()
  }

  test("in-corpus arrivals score exactly t_lm_score's rows") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = LmServe.buildLmModel(docs, $"text")
    val online = LmServe
      .withOnlineLmScore(docs.filter($"doc_id" < 50), $"doc_id", $"text", model)
      .collect().map(key).toSet
    val batch = graft.ops.LmScore.lmScore(docs, $"doc_id", $"text")
      .filter($"doc_id" < 50).collect().map(key).toSet
    assert(online == batch)
  }

  test("out-of-vocabulary arrival: every pair scores floor(log2(V)) bits") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = LmServe.buildLmModel(docs, $"text")
    // tokens absent from the corpus: cb=0 -> n=1, cw=0 -> d=V
    val oov = Seq((999L, "qqxx1 qqxx2 qqxx3")).toDF("doc_id", "text")
    val rows = LmServe.withOnlineLmScore(oov, $"doc_id", $"text", model).collect()
    assert(rows.length == 1)
    val expectBits = (63 - java.lang.Long.numberOfLeadingZeros(model.v)).toLong
    assert(key(rows(0)) == ((999L, 2L, 2 * expectBits, expectBits.toDouble)))
  }

  test("count subtraction == retraining on the corpus minus the tombstones, map-exact") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    // the takedown path's arithmetic, replayed directly on frames:
    // full counts minus the tombstoned docs' counts, zeros dropped
    val (bg, uni) = LmServe.lmCountFrames(docs, $"text")
    val bgAll = bg.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val uniAll = uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tomb = docs.filter($"doc_id" >= 100 && $"doc_id" < 200)
    val (bgT, uniT) = LmServe.lmCountFrames(tomb, $"text")
    val bgTm = bgT.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val uniTm = uniT.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bgSub = bgAll.map { case (k, c) => k -> (c - bgTm.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    val uniSub = uniAll.map { case (k, c) => k -> (c - uniTm.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    // retrained reference on the surviving corpus
    val retr = LmServe.buildLmModel(
      docs.filter($"doc_id" < 100 || $"doc_id" >= 200), $"text")
    val retrBg = retr.bigram.asScala.map { case (k, v) =>
      val Array(w1, w2) = k.split(" ", 2); (w1, w2) -> v.longValue()
    }.toMap
    assert(bgSub == retrBg)
    assert(uniSub == retr.unigram.asScala.map { case (k, v) => k -> v.longValue() }.toMap)
    assert(uniSub.size.toLong == retr.v)
  }
}
