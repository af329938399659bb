package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the durable-index deployment claim: a frozen IVF index saved
  * as parquet and RELOADED IN A FRESH SESSION serves the incremental
  * add bit-identically to the in-session leased artifact. (One JVM
  * holds one SparkContext, so "fresh session" here is
  * `spark.newSession()` — fresh session state, no shared temp views
  * or session config; the reloaded lineage is proven to be a plain
  * parquet scan structurally, so nothing context-resident can leak
  * into the served result.) */
class IndexStoreSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("reloaded-serve == leased-serve bit-equality; reloaded lineage is a pure parquet scan") {
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_ivfstore_spec"
    // train + freeze in the "training job", dump the artifact pair
    val (baseIdx, centroids) = IvfAdd.frozenIndex(spark, sf)
    IndexStore.save(root, "base" -> baseIdx, "centroids" -> centroids)
    // the leased serve (consume BEFORE re-invoking the family —
    // lease contract)
    val leased = IvfAdd.addAndServe(spark, sf, baseIdx, centroids,
      nprobe = 4, k = 5).collect()
    assert(leased.nonEmpty)

    // the "admission job": a fresh session reloads and serves with
    // zero knowledge of training
    val s2 = spark.newSession()
    val base2 = IndexStore.load(s2, root, "base")
    val cents2 = IndexStore.load(s2, root, "centroids")
    // structural durability: the reloaded frames are plain parquet
    // scans — no lease (ExistingRDD), no training lineage
    Seq(base2, cents2).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("Scan parquet"), p)
      assert(!p.contains("Scan ExistingRDD"), p)
    }
    val stored = IvfAdd.addAndServe(s2, sf, base2, cents2,
      nprobe = 4, k = 5).collect()

    // bit-equality: identical row count, and every field exactly equal
    // (doubles compared by ==, not tolerance — parquet round-trips
    // IEEE754 exactly and the serve arithmetic is identical)
    assert(stored.length == leased.length)
    leased.zip(stored).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2) && a.getDouble(3) == b.getDouble(3) &&
        a.getInt(4) == b.getInt(4), s"row mismatch: $a vs $b")
    }

    // and the oracle-covered query variant runs the whole cycle
    val out = IvfAdd.ivfStoredTopK(spark, sf, nprobe = 4, k = 5).collect()
    assert(out.length == leased.length)
  }
}
