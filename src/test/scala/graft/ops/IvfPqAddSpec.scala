package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the quantized add path's STRUCTURAL frozen-encoding
  * invariants — the engine's computed assignment/codes are compared
  * against an independent Scala argmax over the COLLECTED frozen
  * artifacts, never against the last training round's recorded state
  * (the IvfAdd lesson: trained assignments coincide with the frozen
  * serving argmax only at Lloyd convergence). */
class IvfPqAddSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dotS(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  test("frozen encoding: increment cells and codes equal the frozen-artifact argmaxes; twins serve at cos ~ 1") {
    import spark.implicits._
    // snapshot the frozen artifacts FIRST (the query re-leases the
    // same tags; collect before re-invoking the family)
    val fz = IvfPqAdd.frozenArtifacts(spark, sf)
    val cents = fz.centroids.filter($"cn" > 0)
      .select($"c_label", $"cv", $"cn").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    val centByLabel = fz.centroids.select($"c_label", $"cv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val book = fz.book.select($"sub", $"c_label", $"cv", $"cself").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2), r.getDouble(3)))
    val bookBySub = book.groupBy(_._1).view
      .mapValues(_.sortBy(_._2)).toMap
    // the arriving batch the query re-ingests, and the ENGINE's actual
    // add-path outputs for it: coarse cells + per-subspace codes
    val inc = fz.coarse.select($"vec_id", $"v", $"nrm")
      .filter($"vec_id" < 30)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    val assigned = IvfPqAdd.assignCoarse(inc, fz.centroids)
    val engineCells = assigned.select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val engineCodes = IvfPqAdd.encodeAgainst(
        IvfPqAdd.residualOf(assigned, fz.centroids), fz.book)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val incVecs = inc.select($"vec_id", $"v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(engineCells.nonEmpty && engineCodes.nonEmpty)
    // independent frozen-centroid coarse argmax (cells ascending,
    // strictly-greater keep)
    def coarseArgmax(v: Seq[Double]): Long = {
      var bc = Long.MaxValue; var best = Double.NegativeInfinity
      cents.foreach { case (label, cv, cn) =>
        val s = dotS(v, cv) / cn
        if (s > best) { best = s; bc = label }
      }
      bc
    }
    // independent frozen-book subspace argmax on the residual
    def codeArgmax(sv: Seq[Double], sub: Int): Long = {
      var bc = Long.MaxValue; var best = Double.NegativeInfinity
      bookBySub(sub).foreach { case (_, label, cv, cself) =>
        val s = dotS(sv, cv) - 0.5 * cself
        if (s > best) { best = s; bc = label }
      }
      bc
    }
    incVecs.foreach { case (id, v) =>
      val cell = coarseArgmax(v)
      assert(engineCells(id) == cell,
        s"inc $id: coarse cell ${engineCells(id)} != frozen argmax $cell")
      val resid = v.zip(centByLabel(cell)).map { case (a, b) => a - b }
      (0 until ProductQuant.PqM).foreach { sub =>
        val sv = resid.slice(sub * ProductQuant.PqDsub, (sub + 1) * ProductQuant.PqDsub)
        val code = codeArgmax(sv, sub)
        assert(engineCodes((id, sub)) == code,
          s"inc $id sub $sub: code ${engineCodes((id, sub))} != frozen argmax $code")
      }
    }
    // the encoded batch is SERVABLE: every query's rank-1 hit scores
    // cos ~ 1 (its verbatim twin, or another verbatim duplicate with a
    // smaller id winning the tie-break), and every twin the top-k
    // surfaces scores cos ~ 1
    val out = IvfPqAdd.ivfPqAddTopK(spark, sf, nprobe = 4, m = 10, k = 5).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val r1 = rows.find(_.getInt(1) == 1).get
      assert(math.abs(r1.getDouble(4) - 1.0) < 1e-9,
        s"query $q: rank-1 cos ${r1.getDouble(4)}")
      // the query's OWN twin survived the ADC cut and re-ranked at
      // cos 1 (another query's twin may legitimately appear at any
      // cosine — only the self-twin is pinned)
      val twin = rows.find(_.getLong(3) == q + 1000000L)
      assert(twin.isDefined, s"query $q: twin not in top-5")
      assert(math.abs(twin.get.getDouble(4) - 1.0) < 1e-9,
        s"query $q: twin cos ${twin.get.getDouble(4)}")
    }
  }

  test("remove_ids on the quantized index: tombstoned ids vanish as neighbors, queries and survivors untouched") {
    import spark.implicits._
    // both deletion classes: base ids 5-9 and added ids 1,000,010+
    val tomb = spark.range(5, 10).select($"id".as("vec_id"))
      .unionByName(spark.range(1000010L, 1000020L).select($"id".as("vec_id")))
    val tombIds = (5L until 10L).toSet ++ (1000010L until 1000020L).toSet
    val del = IvfPqAdd.pqAddAndServe(spark, IvfPqAdd.frozenArtifacts(spark, sf),
        nprobe = 4, m = 10, k = 5, tombstones = Some(tomb)).collect()
    assert(del.nonEmpty)
    // no tombstoned id serves as a NEIGHBOR anywhere
    assert(!del.exists(r => tombIds(r.getLong(3))),
      "tombstoned id surfaced as a neighbor")
    // deletion removes index entries only — tombstoned base ids still
    // QUERY (remove_ids has no effect on the external query set)
    assert((5L until 10L).forall(q => del.exists(_.getLong(0) == q)),
      "tombstoned base id stopped querying")
    // surviving twins: a query whose twin was NOT tombstoned still
    // finds it at cos ~ 1 (the rest of the index is untouched)
    val untouched = del.filter(r => !tombIds(r.getLong(0) + 1000000L))
      .groupBy(_.getLong(0))
    untouched.foreach { case (q, rows) =>
      val twin = rows.find(_.getLong(3) == q + 1000000L)
      assert(twin.isDefined && math.abs(twin.get.getDouble(4) - 1.0) < 1e-9,
        s"query $q: surviving twin missing or off-cos")
    }
  }
}
