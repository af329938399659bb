package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class NbDoc(doc_id: Long, text: String)

/** [[ClassifyServe]] — the frozen-NB online classifier as a REAL
  * StreamingQuery: arrivals classified in micro-batches against the
  * broadcast model must equal the batch scorer's rows AND the
  * column-algebra operator's predictions for the same ids (the JVM
  * bits loop held to bit-equality with the SQL form, same contract as
  * the LM/excess/DSIR twins). */
class StreamClassifySpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed NB predictions == batch scorer == column-algebra operator") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val model = ClassifyServe.buildNbModel(docs, $"doc_id", $"text", $"lang")
    val rows = docs.select($"doc_id", $"text").as[NbDoc].collect().sortBy(_.doc_id)

    val in = MemoryStream[NbDoc]
    val q = ClassifyServe.withOnlineNbPredict(in.toDF(), $"doc_id", $"text", model)
      .writeStream.format("memory").queryName("w_classify_stream")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"pred_lang", $"bits_best").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      val got = key(spark.table("w_classify_stream"))
      val batch = key(ClassifyServe.withOnlineNbPredict(docs, $"doc_id", $"text", model))
      assert(got.nonEmpty && got == batch)
      // and both equal the column-algebra operator's (pred, bits)
      val alg = graft.ops.Classify
        .nbPredict(docs, $"doc_id", $"text", $"lang", "lang")
        .select($"doc_id", $"pred_lang", $"bits_best").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(alg == got)
    } finally q.stop()
  }

  test("hashed model: one scorer serves either form, == hashed column-algebra operator") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val (cls, cnt) = ClassifyServe.nbCountFrames(docs, $"text", $"lang",
      featOf = graft.ops.Classify.hashedFeat)
    val model = ClassifyServe.nbModelFromFrames(cls, cnt,
      Some(graft.ops.Classify.HashedFeatureBuckets))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id",
        org.apache.spark.sql.functions.col(
          df.columns.find(_.startsWith("pred")).get),
        $"bits_best").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val served = key(
      ClassifyServe.withOnlineNbPredict(docs, $"doc_id", $"text", model))
    val alg = key(graft.ops.Classify.nbPredict(
      docs, $"doc_id", $"text", $"lang", "lang",
      featOf = graft.ops.Classify.hashedFeat))
    assert(served.nonEmpty && served == alg,
      "hashed JVM serve diverged from the hashed column algebra")
    // the hashed model's key space is bucket-bounded — the artifact
    // can never trip the vocabulary cap
    assert(model.counts.size <= graft.ops.Classify.HashedFeatureBuckets)
    // collision pooling pinned non-vacuously: at 16 buckets the smoke
    // vocabulary MUST collide (at 4096 it need not — bit-equal
    // agreement with the raw model there is expected, not vacuous),
    // and the JVM scorer must still track the column algebra exactly
    // through the pooled evidence
    val b16 = 16
    val feat16 = (w: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.pmod(
        graft.functions.PortableHash.md5Hash60(w),
        org.apache.spark.sql.functions.lit(b16.toLong)).cast("string")
    val (cls16, cnt16) = ClassifyServe.nbCountFrames(docs, $"text", $"lang",
      featOf = feat16)
    val model16 = ClassifyServe.nbModelFromFrames(cls16, cnt16, Some(b16))
    assert(model16.counts.size <= b16)
    val served16 = key(
      ClassifyServe.withOnlineNbPredict(docs, $"doc_id", $"text", model16))
    val alg16 = key(graft.ops.Classify.nbPredict(
      docs, $"doc_id", $"text", $"lang", "lang", featOf = feat16))
    assert(served16 == alg16,
      "16-bucket JVM serve diverged from the column algebra")
    val raw = key(ClassifyServe.withOnlineNbPredict(docs, $"doc_id", $"text",
      ClassifyServe.buildNbModel(docs, $"doc_id", $"text", $"lang")))
    assert(raw.exists { case (id, v) => served16(id) != v },
      "16-bucket pooling changed no (pred, bits) — vacuous fixture")
  }
}
