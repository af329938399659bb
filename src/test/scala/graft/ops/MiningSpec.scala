package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class MiningSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("hard negatives: every mined neighbor carries a different label; ranks contiguous") {
    val out = Mining.hardNegativesTopK(spark, sf, nprobe = 4, k = 5).collect()
    assert(out.nonEmpty)
    // (query_id, q_label, rank, neighbor_id, n_label, cos)
    out.foreach { r =>
      assert(r.getInt(1) != r.getInt(4),
        s"query ${r.getLong(0)}: negative ${r.getLong(3)} shares label ${r.getInt(1)}")
      assert(r.getLong(0) != r.getLong(3))
    }
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val ranks = rows.map(_.getInt(2)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"query $q ranks $ranks")
    }
  }

  test("at nprobe = nlist the cell bound is vacuous: mining equals the label-excluded brute force") {
    import spark.implicits._
    val mined = Mining.hardNegativesTopK(
        spark, sf, nprobe = Similarity.IvfNlist, k = 5)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // direct label-excluded brute force over the same corpus
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"label", Similarity.asDouble($"embedding").as("v"))
      .withColumn("nrm", Similarity.l2norm($"v"))
    val q = emb.filter($"vec_id" < 20 && $"nrm" > 0)
      .select($"vec_id".as("query_id"), $"label".as("q_label"),
        $"v".as("qv"), $"nrm".as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    val bf = q.crossJoin(emb.filter($"nrm" > 0)
        .select($"vec_id".as("neighbor_id"), $"label".as("n_label"),
          $"v".as("nv"), $"nrm".as("nn")))
      .filter($"query_id" =!= $"neighbor_id" && $"n_label" =!= $"q_label")
      .select($"query_id", $"neighbor_id",
        (Similarity.dot($"qv", $"nv") / ($"qn" * $"nn")).as("cos"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(mined == bf,
      s"mined ${mined.size} vs brute ${bf.size}; diff ${(mined diff bf).take(3)} / ${(bf diff mined).take(3)}")
  }

  test("stored mining == built mining, bit-exact (incl. cosines), fresh session") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4),
        r.getDouble(5))
    val built = Mining.hardNegativesTopK(spark, sf, nprobe = 4, k = 5)
      .collect().map(key).toSet
    // fresh session: the stored path must reload everything it needs
    // from the parquet artifact — no shared lease can leak in
    val s2 = spark.newSession()
    val stored = Mining.hardNegativesStoredTopK(s2, sf, nprobe = 4, k = 5)
      .collect().map(key).toSet
    assert(built.nonEmpty)
    assert(stored == built,
      s"diff ${(stored diff built).take(3)} / ${(built diff stored).take(3)}")
  }
}
