package graft.streaming

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The durable broadcast-index serving forms are BIT-EQUAL to their
  * build-in-session twins: the stored artifact (coded ANN corpus,
  * LM count frames, decontamination blocklist signatures) reloads
  * from parquet and serves the exact row set — every stored value is
  * an exact long, an int-valued double, or an md5 string, so the
  * round-trip may not perturb a single bit. The driver's oracle
  * hash-compare proves this transitively at sf0.01/sf0.1 (both twins
  * hash-match the same DuckDB replay); this spec pins it directly,
  * including the exact doubles, at smoke scale. */
class StoredServeSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stored broadcast-index serving == built serving, bit-equal: ANN, LM, decontamination") {
    Seq(
      "w_ann" -> "w_ann_stored",
      "w_lm_score" -> "w_lm_stored",
      "w_decontaminate" -> "w_decontaminate_stored",
      "w_classify_nb" -> "w_classify_stored"
    ).foreach { case (built, stored) =>
      val a = graft.SparkEntry.queries(built)(spark, sf)
        .collect().map(_.toSeq).toSeq
      val b = graft.SparkEntry.queries(stored)(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(a.nonEmpty, s"$built returned no rows at smoke scale")
      assert(a == b, s"$stored diverged from $built")
    }
  }

  test("artifact-surgery forms == direct rebuilds: ANN add/takedown, LM add/takedown, blocklist add/takedown") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
    val docs = graft.model.Tables.table(spark, sf, "documents")

    def rowsOf(name: String) =
      graft.SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq

    // w_ann_takedown == serve from an index BUILT on corpus minus ids 30-39
    locally {
      val direct = AnnServe.buildAnnIndex(
        emb.filter($"vec_id" < 30 || $"vec_id" >= 40), $"vec_id", $"embedding")
      val want = AnnServe.withOnlineAnn(
          emb.filter($"vec_id" < 20), $"vec_id", $"embedding", direct, k = 5)
        .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
      assert(rowsOf("w_ann_takedown") == want, "w_ann_takedown != direct rebuild")
    }
    // w_ann_add == serve from an index BUILT on corpus + shifted batch
    locally {
      val batch = emb.filter($"vec_id" < 10)
        .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
      val direct = AnnServe.buildAnnIndex(
        emb.select($"vec_id", $"embedding").unionByName(batch),
        $"vec_id", $"embedding")
      val want = AnnServe.withOnlineAnn(
          emb.filter($"vec_id" < 20), $"vec_id", $"embedding", direct, k = 5)
        .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
      assert(want.exists(r => r(3) == 1.0),
        "add fixture must serve a verbatim twin at cos 1.0")
      assert(rowsOf("w_ann_add") == want, "w_ann_add != direct rebuild")
    }
    // w_lm_takedown / w_lm_add == models TRAINED directly on the
    // filtered / unioned corpus
    def lmServeWith(corpus: org.apache.spark.sql.DataFrame) = {
      val model = LmServe.buildLmModel(corpus, $"text")
      LmServe.withOnlineLmScore(
          docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
        .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    }
    assert(rowsOf("w_lm_takedown") ==
      lmServeWith(docs.filter($"doc_id" < 100 || $"doc_id" >= 200)),
      "w_lm_takedown != direct retrain")
    assert(rowsOf("w_lm_add") ==
      lmServeWith(docs.select($"doc_id", $"text").unionByName(
        docs.filter($"doc_id" < 30).select(($"doc_id" + 2000000L).as("doc_id"),
          substring($"text", 1, 40).as("text")))),
      "w_lm_add != direct retrain")
    // w_classify_takedown / w_classify_add == NB models TRAINED
    // directly on the filtered / unioned corpus (count-frame surgery
    // must equal the retrain, same additivity argument as the LM)
    def nbServeWith(corpus: org.apache.spark.sql.DataFrame) = {
      val model = ClassifyServe.buildNbModel(corpus, $"doc_id", $"text", $"lang")
      ClassifyServe.withOnlineNbPredict(
          docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
        .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    }
    assert(rowsOf("w_classify_takedown") ==
      nbServeWith(docs.filter($"doc_id" < 100 || $"doc_id" >= 200)),
      "w_classify_takedown != direct retrain")
    assert(rowsOf("w_classify_add") ==
      nbServeWith(docs.select($"doc_id", $"lang", $"text").unionByName(
        docs.filter($"doc_id" < 30).select(($"doc_id" + 2000000L).as("doc_id"),
          $"lang", substring($"text", 1, 40).as("text")))),
      "w_classify_add != direct retrain")
    // w_decontaminate_takedown / _add == blocklists BUILT directly on
    // the filtered / widened benchmark slice
    def deconServeWith(trMin: Int, bmMax: Int, bmPred: org.apache.spark.sql.Column) = {
      val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
      val all = docs.withColumn("__bucket", bucket)
      val training = all.filter($"__bucket" >= trMin).drop("__bucket")
      val blocklist = all.filter($"__bucket" < bmMax && bmPred).drop("__bucket")
      val idx = NearDup.buildBlocklistIndex(blocklist, $"doc_id", $"text", 0.5)
      NearDup.withOnlineDecontamination(training, $"text", "__clean", idx)
        .filter($"__clean")
        .select($"doc_id", $"source", $"n_chars")
        .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    }
    assert(rowsOf("w_decontaminate_takedown") ==
      deconServeWith(20, 20, $"doc_id" >= 100),
      "w_decontaminate_takedown != direct rebuild")
    assert(rowsOf("w_decontaminate_add") ==
      deconServeWith(26, 26, lit(true)),
      "w_decontaminate_add != direct rebuild")
  }
}
