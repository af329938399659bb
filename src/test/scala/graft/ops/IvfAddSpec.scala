package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class IvfAddSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("frozen quantizer: twins land in the frozen-centroid argmax cell and serve at cos ~ 1") {
    import spark.implicits._
    // snapshot the frozen artifact FIRST (the query re-leases the same
    // tags; collect before re-invoking the family per the lease
    // contract): the serving centroids and the original base vectors
    val (baseIdx, centroids) = IvfAdd.frozenIndex(spark, sf)
    val baseVecs = baseIdx.filter($"vec_id" < 30)
      .select($"vec_id", $"v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cents = centroids.filter($"cn" > 0)
      .select($"c_label", $"cv", $"cn").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
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
    // assignment invariant (STRUCTURAL, not convergence-dependent):
    // an identical vector assigned by the FROZEN serving centroids
    // gets exactly the frozen-centroid argmax cell of its original's
    // vector — the same strictly-greater fold over cells ascending the
    // add path runs. (The original's RECORDED trained cell is the last
    // Lloyd round's assignment and need not coincide unless training
    // converged, so it is deliberately NOT the reference here.)
    def frozenArgmax(v: Seq[Double]): Long = {
      var bestCell = Long.MaxValue
      var best = Double.NegativeInfinity
      cents.foreach { case (label, cv, cn) =>
        val score = v.iterator.zip(cv.iterator).map { case (a, b) => a * b }.sum / cn
        if (score > best) { best = score; bestCell = label }
      }
      bestCell
    }
    val twins = out.filter(_.getLong(2) >= 1000000L)
    assert(twins.nonEmpty)
    twins.foreach { r =>
      val orig = r.getLong(2) - 1000000L
      val expected = frozenArgmax(baseVecs(orig))
      assert(r.getLong(1) == expected,
        s"twin of $orig: cell ${r.getLong(1)} != frozen argmax $expected")
    }
  }

  test("remove_ids: tombstoned ids never serve; queries whose base was removed still find their twin at cos 1") {
    import spark.implicits._
    val (baseIdx, centroids) = IvfAdd.frozenIndex(spark, sf)
    val tomb = spark.range(5, 10).select($"id".as("vec_id"))
      .unionByName(spark.range(1000010L, 1000020L).select($"id".as("vec_id")))
    val removed = (5L until 10L).toSet ++ (1000010L until 1000020L).toSet
    val out = IvfAdd.addAndServe(spark, sf, baseIdx, centroids,
      nprobe = 4, k = 5, Some(tomb)).collect()
    assert(out.nonEmpty)
    // no tombstoned id in any result row
    out.foreach { r =>
      assert(!removed.contains(r.getLong(2)),
        s"removed id ${r.getLong(2)} served for query ${r.getLong(0)}")
    }
    // deletion class 1 (base removed, twin kept): queries 5-9 rank-1
    // at cos 1 — the twin (or another verbatim duplicate) serves
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      if (q >= 5 && q < 10) {
        val r1 = rows.find(_.getInt(4) == 1).get
        assert(math.abs(r1.getDouble(3) - 1.0) < 1e-9,
          s"query $q (base tombstoned): rank-1 cos ${r1.getDouble(3)}")
      }
    }
  }
}
