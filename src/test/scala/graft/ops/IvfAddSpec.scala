package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class IvfAddSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("frozen quantizer: twins land in their original's trained cell and serve at cos ~ 1") {
    import spark.implicits._
    val out = IvfAdd.ivfAddTopK(spark, sf, nprobe = 4, k = 5).collect()
    assert(out.nonEmpty)
    // (query_id, cell, neighbor_id, cos, rank)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      // the verbatim twin (q + 1000000) is searchable: it appears in
      // the query's top-k with cosine 1 (identical vector), and the
      // rank-1 score is therefore 1 too (the twin or another verbatim
      // duplicate with a smaller id wins the tie-break)
      val twin = rows.find(_.getLong(2) == q + 1000000L)
      assert(twin.isDefined, s"query $q: twin not in top-5")
      assert(math.abs(twin.get.getDouble(3) - 1.0) < 1e-9,
        s"query $q: twin cos ${twin.get.getDouble(3)}")
      val r1 = rows.find(_.getInt(4) == 1).get
      assert(math.abs(r1.getDouble(3) - 1.0) < 1e-9,
        s"query $q: rank-1 cos ${r1.getDouble(3)}")
    }
    // cell invariant: an identical vector assigned by the FROZEN
    // centroids gets exactly the cell its original trained into —
    // check it on every twin the output surfaced (the output's cell
    // column is the neighbor's own cell; cells are disjoint)
    val trained = Similarity.trainedCells(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twins = out.filter(_.getLong(2) >= 1000000L)
    assert(twins.nonEmpty)
    twins.foreach { r =>
      val orig = r.getLong(2) - 1000000L
      assert(r.getLong(1) == trained(orig),
        s"twin of $orig: cell ${r.getLong(1)} != trained ${trained(orig)}")
    }
  }
}
