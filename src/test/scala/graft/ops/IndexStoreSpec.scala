package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
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

  test("tombstone compaction: serve-after-compaction == serve-with-anti-join bit-equality; compacted artifact drops exactly the tombstoned rows") {
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_compact_spec"
    val (baseIdx, centroids) = IvfAdd.frozenIndex(spark, sf)
    IndexStore.save(root, "base" -> baseIdx, "centroids" -> centroids)

    // the admission job: fresh session, tombstones served via the
    // remove_ids anti-join
    val s2 = spark.newSession()
    val tomb = s2.range(5, 10)
      .select(org.apache.spark.sql.functions.col("id").as("vec_id"))
    val cents2 = IndexStore.load(s2, root, "centroids")
    val withAnti = IvfAdd.addAndServe(s2, sf,
      IndexStore.load(s2, root, "base"), cents2, nprobe = 4, k = 5,
      Some(tomb)).collect()
    assert(withAnti.nonEmpty)

    // compact the stored artifact in place, then serve with NO
    // tombstones at all
    val nBefore = IndexStore.load(s2, root, "base").count()
    IndexStore.compact(s2, root, "base", tomb)
    val compacted = IndexStore.load(s2, root, "base")
    assert(compacted.count() == nBefore - 5,
      "compaction must drop exactly the 5 tombstoned base rows")
    assert(compacted.filter(
      org.apache.spark.sql.functions.col("vec_id").between(5, 9)).count() == 0)
    val served = IvfAdd.addAndServe(s2, sf, compacted, cents2,
      nprobe = 4, k = 5, None).collect()

    assert(served.length == withAnti.length)
    withAnti.zip(served).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2) && a.getDouble(3) == b.getDouble(3) &&
        a.getInt(4) == b.getInt(4), s"row mismatch: $a vs $b")
    }
  }

  test("dedup corpus index round-trip: reloaded admission decisions == leased admission decisions in a fresh session") {
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_lshstore_spec"
    def fixture(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      val base = graft.model.Tables.table(s, sf, "documents")
        .select($"doc_id", $"text")
      val b0 = base.filter($"doc_id" < 30)
      val batch = b0.select(($"doc_id" + 1000000L).as("doc_id"), $"text")
        .unionByName(b0.select(($"doc_id" + 2000000L).as("doc_id"),
          substring($"text", 1, 40).as("text")))
        .unionByName(b0.select(($"doc_id" + 3000000L).as("doc_id"),
          substring($"text", 1, 40).as("text")))
      (base, batch)
    }
    // the "corpus build job": signatures computed once, bands derived
    // from the STORED frame, both saved
    val (base1, batch1) = fixture(spark)
    val sigs = Dedup.minhashSignatures(base1, $"doc_id", $"text", 32)
    IndexStore.save(root, "lsh_sigs" -> sigs)
    IndexStore.save(root, "lsh_bands" ->
      IndexStore.load(spark, root, "lsh_sigs").select($"id",
        explode(array(Dedup.minhashBandKeys(32, 16): _*)).as("band")))
    // the leased path's admission decisions (survivor id set)
    val leased = Dedup.lshIncrementSurvivors(base1, batch1)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(leased.nonEmpty)

    // the "day-2 admission job": a fresh session reloads the index
    // with zero knowledge of the corpus text
    val s2 = spark.newSession()
    val sigs2 = IndexStore.load(s2, root, "lsh_sigs")
    val bands2 = IndexStore.load(s2, root, "lsh_bands")
    Seq(sigs2, bands2).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("Scan parquet"), p)
      assert(!p.contains("Scan ExistingRDD"), p)
    }
    val (_, batch2) = fixture(s2)
    val stored = Dedup.lshIncrementFromIndex(sigs2, bands2, batch2)
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(stored == leased,
      s"admission decisions diverge: only-leased ${leased -- stored}, only-stored ${stored -- leased}")

    // and the oracle-covered query variant runs the whole cycle
    val q = Dedup.queries.find(_.name == "dd_lsh_stored").get
    assert(q.fn(spark, sf).count() == leased.size)
  }

  test("dedup index compaction: forgetting corpus documents == admitting against the corpus minus them") {
    import spark.implicits._
    // the takedown path a training-data pipeline needs: documents
    // removed from the corpus (rights requests, licensing) must stop
    // suppressing future admissions WITHOUT rebuilding the index —
    // compact both stored frames by the same tombstone set
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_lshcompact_spec"
    val base = graft.model.Tables.table(spark, sf, "documents")
      .select($"doc_id", $"text")
    val b0 = base.filter($"doc_id" < 30)
    val batch = b0.select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val sigs = Dedup.minhashSignatures(base, $"doc_id", $"text", 32)
    IndexStore.save(root, "lsh_sigs" -> sigs)
    IndexStore.save(root, "lsh_bands" ->
      IndexStore.load(spark, root, "lsh_sigs").select($"id",
        explode(array(Dedup.minhashBandKeys(32, 16): _*)).as("band")))
    // admission BEFORE forgetting: every verbatim twin is dominated by
    // its corpus original
    val before = Dedup.lshIncrementFromIndex(
        IndexStore.load(spark, root, "lsh_sigs"),
        IndexStore.load(spark, root, "lsh_bands"), batch)
      .select($"doc_id").collect().map(_.getLong(0)).toSet

    val tomb = spark.range(0, 10).select($"id")
    IndexStore.compact(spark, root, "lsh_sigs", tomb, idCol = "id")
    IndexStore.compact(spark, root, "lsh_bands", tomb, idCol = "id")
    val after = Dedup.lshIncrementFromIndex(
        IndexStore.load(spark, root, "lsh_sigs"),
        IndexStore.load(spark, root, "lsh_bands"), batch)
      .select($"doc_id").collect().map(_.getLong(0)).toSet

    // reference semantics: admission against the corpus minus the
    // forgotten documents
    val reference = Dedup.lshIncrementSurvivors(
        base.filter($"doc_id" >= 10 || $"doc_id" < 0), batch)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(after == reference,
      s"compacted admission diverges: only-compacted ${after -- reference}, only-reference ${reference -- after}")
    // and the tombstones MATTERED: at least one twin of a forgotten
    // original is newly admitted (nothing else suppressed it)
    assert((after -- before).nonEmpty,
      "forgetting the originals should admit at least one formerly-dominated twin")
    (after -- before).foreach { id =>
      assert(id - 1000000L < 10, s"unexpected newly-admitted id $id")
    }
  }

  test("vector corpus index round-trip: reloaded admission decisions == leased admission decisions in a fresh session") {
    import spark.implicits._
    def fixture(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      val base = graft.model.Tables.table(s, sf, "embeddings")
        .select($"vec_id", $"embedding")
      val b0 = base.filter($"vec_id" < 30)
      val neg = transform($"embedding", x => -x).as("embedding")
      val batch = b0.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
        .unionByName(b0.select(($"vec_id" + 2000000L).as("vec_id"), neg))
        .unionByName(b0.select(($"vec_id" + 3000000L).as("vec_id"), neg))
      (base, batch)
    }
    val (base1, batch1) = fixture(spark)
    val leased = Dedup.embedIncrementSurvivors(base1, batch1)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(leased.nonEmpty)
    // embedStoredSurvivors saves + reloads internally; drive the
    // admission itself from a FRESH session so nothing session-resident
    // can leak into the decisions
    val s2 = spark.newSession()
    val (base2, batch2) = fixture(s2)
    val stored = Dedup.embedStoredSurvivors(base2, batch2)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(stored == leased,
      s"admission decisions diverge: only-leased ${leased -- stored}, only-stored ${stored -- leased}")
  }

  test("quantized index round-trip: reloaded-serve == leased-serve bit-equality; reloaded artifacts are pure parquet scans") {
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_pqstore_spec"
    val f = IvfPqAdd.frozenArtifacts(spark, sf)
    IndexStore.save(root, "coarse" -> f.coarse, "centroids" -> f.centroids,
      "book" -> f.book, "codes" -> f.codes)
    val leased = IvfPqAdd.pqAddAndServe(spark, f, nprobe = 4, m = 10, k = 5)
      .collect()
    assert(leased.nonEmpty)

    val s2 = spark.newSession()
    val reloaded = IvfPqAdd.Frozen(
      IndexStore.load(s2, root, "coarse"),
      IndexStore.load(s2, root, "centroids"),
      IndexStore.load(s2, root, "book"),
      IndexStore.load(s2, root, "codes"))
    Seq(reloaded.coarse, reloaded.centroids, reloaded.book, reloaded.codes)
      .foreach { df =>
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("Scan parquet"), p)
        assert(!p.contains("Scan ExistingRDD"), p)
      }
    val stored = IvfPqAdd.pqAddAndServe(s2, reloaded, nprobe = 4, m = 10, k = 5)
      .collect()
    assert(stored.length == leased.length)
    leased.zip(stored).foreach { case (a, b) =>
      assert(a == b, s"row mismatch: $a vs $b")
    }
  }
}
