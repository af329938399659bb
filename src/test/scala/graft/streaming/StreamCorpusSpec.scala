package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Arrival(doc_id: Long, lang: String, text: String)

/** The online corpus pipeline: micro-batch replay of the SAME composed
  * transform (gates + LM + keep-first index) equals the batch form,
  * and every gate exercises both verdicts on the fixture corpus. */
class StreamCorpusSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming corpus pipeline across 4 micro-batches == batch w_corpus") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = LmServe.buildLmModel(docs, $"text")

    val arrivals = docs.select($"doc_id", $"lang", $"text")
      .as[Arrival].collect().toSeq.sortBy(_.doc_id)
    val mem = MemoryStream[Arrival]
    // the same composed transform the batch query runs, minus the
    // batch-only anti-join: survivors subtract at the sink
    val dropped = NearDup.droppedByIndex(
      StreamCorpus.gatedArrivals(mem.toDF(), model), $"doc_id", $"text", 0.5)
    val q = dropped.writeStream.format("memory").queryName("wcorpus")
      .outputMode("append").start()
    try {
      arrivals.grouped(130).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamedDropped =
        spark.table("wcorpus").collect().map(_.getLong(0)).toSet

      val gatedBatch = StreamCorpus.gatedArrivals(docs, model)
      val batchDropped = NearDup
        .droppedByIndex(gatedBatch, $"doc_id", $"text", 0.5)
        .collect().map(_.doc_id).toSet
      assert(streamedDropped == batchDropped)

      // sink-side survivor subtraction == the batch query's anti-join
      val gatedIds = gatedBatch.select($"doc_id").collect().map(_.getLong(0)).toSet
      val batchRows = graft.SparkEntry.queries("w_corpus")(spark, sf)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(gatedIds -- streamedDropped == batchRows)

      // every stage is exercised: gates drop, the LM gate drops, the
      // index drops, and survivors remain
      val nDocs = arrivals.size
      assert(gatedIds.nonEmpty && gatedIds.size < nDocs)
      assert(streamedDropped.nonEmpty)
      assert(batchRows.nonEmpty && batchRows.size < gatedIds.size)
    } finally q.stop()
  }

  test("w_corpus_nb: frozen-classifier gate exercises both verdicts; composition is consistent") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val gated = StreamCorpus.heuristicArrivals(docs)
    val gatedIds = gated.select($"doc_id").collect().map(_.getLong(0)).toSet
    val out = graft.SparkEntry.queries("w_corpus_nb")(spark, sf).collect()
    val outIds = out.map(_.getLong(0)).toSet
    // the NB gate admits some and drops some of the heuristic-gated set
    assert(outIds.nonEmpty && outIds.subsetOf(gatedIds))
    assert(outIds.size < gatedIds.size,
      "NB gate admitted everything — the frozen classifier gate is untested")
    // the gate is the frozen model's PREDICTION: rebuild it and check
    // the admitted set is exactly the 'hi'-predicted gated docs minus
    // the dedup-dropped ones
    val q = docs
      .withColumn("__toks", graft.ops.TextAnalysis.tokens($"text"))
      .select($"doc_id",
        graft.ops.TextAnalysis.qualityScoreOf($"text", $"__toks").as("quality"))
    val labeled = graft.ops.Selection.topFracByOrder(q,
        floor(-$"quality" * lit(1024.0)),
        Seq($"quality".desc, $"doc_id".asc), 0.5, "selected")
      .select($"doc_id",
        when($"selected", lit("hi")).otherwise(lit("lo")).as("lab"))
    val model = ClassifyServe.buildNbModel(
      docs.join(labeled, Seq("doc_id")), $"doc_id", $"text", $"lab")
    val predHi = ClassifyServe
      .withOnlineNbPredict(gated, $"doc_id", $"text", model)
      .filter($"pred_lang" === "hi")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(predHi.nonEmpty && predHi.size < gatedIds.size)
    val adm = gated.join(predHi.toSeq.toDF("doc_id"), Seq("doc_id"))
    val dropped = NearDup.droppedByIndex(adm, $"doc_id", $"text", 0.5)
      .collect().map(_.doc_id).toSet
    assert(outIds == predHi -- dropped)
  }

  test("w_curate: streamed stateful stages across micro-batches == batch composition") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    // the frozen artifact: the corpus-relative top-half threshold
    val q = docs
      .withColumn("__toks", graft.ops.TextAnalysis.tokens($"text"))
      .select($"doc_id", $"lang", $"text",
        graft.ops.TextAnalysis.qualityScoreOf($"text", $"__toks").as("quality"))
    val thr = graft.ops.Selection.topFracByOrder(
        q.select($"doc_id", $"quality"),
        floor(-$"quality" * lit(1024.0)),
        Seq($"quality".desc, $"doc_id".asc), 0.5, "selected")
      .filter($"selected").agg(min($"quality")).head().getDouble(0)

    val batchOut = graft.SparkEntry.queries("w_curate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet

    // stage 2 streamed: keep-first index over threshold-admitted
    // arrivals (the gate is the frozen scalar — a stateless filter)
    val arrivals = q.select($"doc_id", $"lang", $"text")
      .as[Arrival].collect().toSeq.sortBy(_.doc_id)
    val mem = MemoryStream[Arrival]
    val admittedStream = mem.toDF()
      .withColumn("__toks", graft.ops.TextAnalysis.tokens($"text"))
      .withColumn("quality",
        graft.ops.TextAnalysis.qualityScoreOf($"text", $"__toks"))
      .filter($"quality" >= thr)
    val sq = NearDup.droppedByIndex(admittedStream, $"doc_id", $"text", 0.5)
      .writeStream.format("memory").queryName("wcurate_drop")
      .outputMode("append").start()
    val streamedDropped = try {
      arrivals.grouped(130).foreach { c => mem.addData(c: _*); sq.processAllAvailable() }
      spark.table("wcurate_drop").collect().map(_.getLong(0)).toSet
    } finally sq.stop()

    val admittedIds = q.filter($"quality" >= thr)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val survivors = admittedIds -- streamedDropped
    assert(survivors == batchOut.map(_._1),
      "streamed keep-first survivors != batch w_curate doc set")

    // stage 3 streamed: online batching over survivor arrivals
    val mem2 = MemoryStream[Arrival]
    val bq = Batching.withOnlineBatches(mem2.toDF(), $"doc_id", $"text")
      .writeStream.format("memory").queryName("wcurate_batch")
      .outputMode("append").start()
    val streamedBatches = try {
      arrivals.filter(a => survivors(a.doc_id)).grouped(97)
        .foreach { c => mem2.addData(c: _*); bq.processAllAvailable() }
      spark.table("wcurate_batch").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    } finally bq.stop()
    assert(streamedBatches == batchOut,
      "streamed per-band batch assignment != batch w_curate assignment")

    // both stages exercise both verdicts on the fixture corpus
    assert(streamedDropped.nonEmpty && survivors.nonEmpty)
    assert(admittedIds.size < arrivals.size)
  }

  test("LM gate drops exactly the high-surprisal tail of the gated set") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = LmServe.buildLmModel(docs, $"text")
    val gated = StreamCorpus.gatedArrivals(docs, model)
      .select($"doc_id", $"avg_bits").collect()
    assert(gated.forall(_.getDouble(1) <= StreamCorpus.LmGate))
    // rebuild the pre-LM stage: at least one doc sits above the gate
    val red = docs.withColumn("text",
      regexp_replace(
        regexp_replace(
          regexp_replace($"text", graft.ops.Pii.EmailRe, graft.ops.Pii.token("EMAIL")),
          graft.ops.Pii.IpRe, graft.ops.Pii.token("IP")),
        graft.ops.Pii.PhoneRe, graft.ops.Pii.token("PHONE")))
    val scored = LmServe.withLmScoreColumn(
        red.select($"doc_id", $"text"), $"text", model)
      .select($"doc_id", $"avg_bits").collect()
    assert(scored.exists(_.getDouble(1) > StreamCorpus.LmGate))
  }
}
