package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProductQuantSpec extends AnyFunSuite with SparkSpec {
  import ProductQuant._

  private val sf = "/root/testdata/sf0.001"

  test("pqCodes: every vector gets exactly m codes, all in [0, ksub)") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
    val codes = pqCodes(emb)
    val shape = codes.groupBy($"vec_id").agg(
        count(lit(1)).as("n"),
        countDistinct($"sub").as("nsub"),
        min($"cell").as("lo"), max($"cell").as("hi"))
      .agg(
        min($"n").as("minn"), max($"n").as("maxn"),
        min($"nsub").as("minsub"), max($"nsub").as("maxsub"),
        min($"lo").as("lo"), max($"hi").as("hi"),
        count(lit(1)).as("nvec"))
      .head()
    assert(shape.getAs[Long]("minn") == PqM && shape.getAs[Long]("maxn") == PqM)
    assert(shape.getAs[Long]("minsub") == PqM && shape.getAs[Long]("maxsub") == PqM)
    assert(shape.getAs[Long]("lo") >= 0 && shape.getAs[Long]("hi") < PqKsub)
    assert(shape.getAs[Long]("nvec") ==
      graft.model.Tables.table(spark, sf, "embeddings").count())
  }

  test("training buys reconstruction: trained codes reconstruct with less total squared error than the hash init") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
    // total squared reconstruction error Σ ||v - recon||² via the
    // exactly-rounded expansion (dot is the fused left-to-right pass)
    def totalErr(recon: org.apache.spark.sql.DataFrame): Double =
      emb.join(recon, Seq("vec_id"))
        .select((Similarity.dot($"v", $"v")
          - lit(2.0) * Similarity.dot($"v", $"recon")
          + Similarity.dot($"recon", $"recon")).as("e"))
        .agg(sum($"e")).head().getDouble(0)
    // consume each leased frame fully before building the next — the
    // "pq" lease releases the prior build's checkpoint blocks
    val trained = totalErr(pqRecon(emb))
    val init = totalErr(pqReconWith(emb, pqInitCodes))
    info(f"total squared reconstruction error: trained $trained%.2f vs init $init%.2f")
    assert(trained < init,
      s"Lloyd training did not reduce reconstruction error: $trained >= $init")
  }

  test("s_ann_pq: recall@5 vs brute force, ranks well-formed, re-rank ordering exact") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val truth = Similarity.bruteForceTopK(emb.filter($"id" < 20), emb, 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pqTopK(spark, sf, m = 10, k = 5).collect()
    val hits = got.map(r => (r.getLong(0), r.getLong(2))).toSet.intersect(truth).size
    // measured 29/100 on this corpus: the 16x-compressed codes rank a
    // 10-candidate shortlist and the exact re-rank orders it — random
    // synthetic embeddings are the PQ worst case (no cluster structure
    // for the codebooks to exploit), so this floor is deliberately the
    // compression-tradeoff number, not a tuned-index number
    info(s"recall@5 vs brute force: $hits/${truth.size}")
    assert(hits >= 25, s"recall@5 collapsed: $hits/${truth.size} < 25/100")
    // per query: ranks are exactly 1..5 and exact-cos descending
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val coss = sorted.map(_.getDouble(3))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("dimension guard: a vector of the wrong length fails loudly, never a silent short slice") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
    val e = intercept[Exception] { pqCodes(bad).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dimension mismatch")), e.toString)
  }
}
