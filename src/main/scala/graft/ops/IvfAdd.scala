package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental IVF ingest — the FAISS `add()` path, and the missing
  * operational half of the IVF family: a 100 TB deployment does NOT
  * retrain its coarse quantizer per arriving batch. It trains once
  * (or per epoch), FREEZES the centroids, and every new batch joins
  * the index through one assignment pass against the frozen
  * quantizer — a broadcast nlist-row join + in-row argmax, i.e. a
  * pure map over the increment, no iterative subtree, no shuffle of
  * the existing index. The index grows append-only (new postings land
  * in existing cells), and serving is unchanged: probe nprobe cells,
  * scan the union index's probed postings.
  *
  * The query trains on the BASE corpus, re-ingests the first 30
  * vectors under shifted ids as the arriving batch (the deterministic-
  * positive convention: every query's verbatim twin lands at cosine
  * 1.0, rank 1), assigns them by the frozen serving centroids, and
  * serves the standard query set over the union. Two invariants the
  * spec pins: a verbatim twin's cell equals the frozen-centroid
  * argmax of its (identical) original vector — the structural
  * identical-vector-identical-assignment property; note the original's
  * RECORDED cell is the last training round's assignment, which
  * coincides with the serving-centroid argmax only once Lloyd's has
  * converged, so the spec does not assert against it — and each
  * query's rank-1 neighbor is its own twin.
  *
  * Scale shape: the trained base index materializes once behind a
  * [[Checkpoints]] lease (as every IVF build does); the serving
  * centroid table leases too (nlist rows — consumed by the increment
  * assignment AND the probe); the increment assignment broadcasts the
  * centroid row and maps; the union is a zero-shuffle UNION ALL of
  * co-shaped projections. Nothing about the add path grows with the
  * EXISTING index size — the property that makes continuous ingest
  * viable at 100 TB.
  *
  * The object carries the index family's full LIFECYCLE as oracle-
  * checked queries: `s_ann_ivf_add` (the add path above),
  * `s_ann_ivf_stored` (the same cycle against a parquet-dumped and
  * RELOADED artifact — [[IndexStore]], the cross-session deployment
  * form), and `s_ann_ivf_del` (FAISS `remove_ids()` — tombstone
  * deletion by one broadcast anti-join, no rebuild).
  */
object IvfAdd {
  import Similarity.{IvfIters, IvfNlist, asDouble, dot, l2norm}

  /** The frozen artifact pair the add path runs against: the trained
    * base index (vec_id, v, nrm, cell) and its serving centroids
    * (c_label, cv, cn). Both leased — training must not re-instantiate
    * per consumer, and the centroids feed the increment assignment AND
    * the probe. Exposed so IvfAddSpec can pin the frozen-centroid
    * assignment invariant against the same artifact the query uses. */
  private[graft] def frozenIndex(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val embBase = table(s, d, "embeddings")
      .select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("nrm", l2norm($"v"))
    // train ONCE on the base; the assigned base corpus is the frozen
    // index (broadcast-map assignment — no corpus-wide vec_id
    // reattachment join, see Similarity.kmeansAssigned)
    val baseIdx = Checkpoints.lease("ivfadd_base",
      Similarity.kmeansAssigned(embBase))
    // frozen serving centroids (quantized mean per trained cell)
    val centroids = Checkpoints.lease("ivfadd_cents",
      Similarity.quantMeanCv(baseIdx, Seq("cell"))
        .select($"cell".as("c_label"), $"cv")
        .withColumn("cn", l2norm($"cv")))
    (baseIdx, centroids)
  }

  def ivfAddTopK(s: SparkSession, d: String, nprobe: Int, k: Int): DataFrame = {
    val (baseIdx, centroids) = frozenIndex(s, d)
    addAndServe(s, d, baseIdx, centroids, nprobe, k)
  }

  /** The add + serve path against a GIVEN frozen artifact pair — the
    * part of [[ivfAddTopK]] a deployment re-runs per arriving batch.
    * Factored so the artifacts can come from the in-session lease
    * (s_ann_ivf_add) OR from a reloaded [[IndexStore]] parquet dump
    * (s_ann_ivf_stored, IndexStoreSpec) — the add path itself is
    * agnostic to where the frozen index came from. */
  private[graft] def addAndServe(s: SparkSession, d: String,
      baseIdx: DataFrame, centroids: DataFrame, nprobe: Int, k: Int,
      tombstones: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val embBase = table(s, d, "embeddings")
      .select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("nrm", l2norm($"v"))
    // the arriving batch: first 30 base vectors under shifted ids
    val inc = embBase.filter($"vec_id" < 30)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    // FAISS add(): ONE assignment pass against the frozen quantizer —
    // the same in-row argmax fold a training round runs (strictly-
    // greater keep = (score DESC, cell ASC) tie-break), over the
    // nondegenerate centroids, broadcast as one row. No retraining.
    val cents1 = centroids.filter($"cn" > 0)
      .groupBy().agg(array_sort(collect_list(
        struct($"c_label", $"cv", $"cn"))).as("cents"))
    val incAssigned = inc.crossJoin(broadcast(cents1))
      .filter(size($"cents") > 0)
      .select($"vec_id", $"v", $"nrm",
        aggregate($"cents",
          struct(lit(Long.MaxValue).as("cell"),
            lit(Double.NegativeInfinity).as("best")),
          (acc, c) => {
            val score = dot($"v", c.getField("cv")) / c.getField("cn")
            when(score > acc.getField("best"),
              struct(c.getField("c_label").as("cell"), score.as("best")))
              .otherwise(acc)
          }).getField("cell").as("cell"))
    // append-only union index: co-shaped projections, zero shuffle
    val index0 = baseIdx.select($"vec_id", $"v", $"nrm", $"cell")
      .unionByName(incAssigned)
    // FAISS remove_ids(): deletion is one broadcast anti-join against
    // the tombstone id set — no rebuild, no retraining, no touch of
    // surviving postings (at 100 TB this is a broadcast-tiny
    // tombstone list; compaction, when the tombstone fraction grows,
    // is a rewrite of the stored artifact, not of the quantizer)
    val index = tombstones
      .map(t => index0.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(index0)
    // serving, unchanged from ivfTopK: probe nprobe cells, scan the
    // union's probed postings, top-k per query
    val q = embBase.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val wProbe = Window.partitionBy($"query_id")
      .orderBy($"c_cos".desc, $"c_label".asc)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("c_cos", dot($"qv", $"cv") / ($"qn" * $"cn"))
      .withColumn("rk", row_number().over(wProbe))
      .filter($"rk" <= nprobe)
      .select($"query_id", $"qv", $"qn", $"c_label".as("cell"))
    val wTop = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    broadcast(probed)
      .join(index.select($"cell", $"vec_id".as("neighbor_id"),
        $"v".as("cv2"), $"nrm".as("cn2")), Seq("cell"))
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"cell", $"neighbor_id",
        (dot($"qv", $"cv2") / ($"qn" * $"cn2")).as("cos"))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .orderBy($"query_id", $"rank")
  }

  /** DuckDB replay of [[ivfAddTopK]]: training unrolled over the base
    * ([[Similarity.kmeansOracleCtes]]), the frozen-centroid increment
    * assignment (one argmax pass over `fcn`'s nondegenerate rows —
    * NOT another training round), the UNION ALL index, then the
    * standard probe + cell-bounded search. */
  private def ivfAddOracle(nprobe: Int, k: Int,
      removePred: Option[String] = None): String =
    s"""WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm
                FROM embeddings),
              ${Similarity.kmeansOracleCtes(IvfNlist, IvfIters)},
              ${Similarity.ivfCentroidCtes(IvfIters)},
              inc AS (
                SELECT vec_id + 1000000 AS vec_id, v, nrm
                FROM e WHERE vec_id < 30),
              isc AS (
                SELECT i.vec_id, f.c_label,
                       row_number() OVER (PARTITION BY i.vec_id
                         ORDER BY list_dot_product(i.v, f.cv) / f.cn DESC,
                                  f.c_label ASC) AS rk
                FROM inc i CROSS JOIN (SELECT * FROM fcn WHERE cn > 0) f),
              ia AS (SELECT vec_id, c_label AS cell FROM isc WHERE rk = 1),
              uni0 AS (
                SELECT e.vec_id, e.v, e.nrm, a.cell
                FROM e JOIN asn$IvfIters a ON a.vec_id = e.vec_id
                UNION ALL
                SELECT i.vec_id, i.v, i.nrm, ia.cell
                FROM inc i JOIN ia ON ia.vec_id = i.vec_id),
              uni AS (SELECT * FROM uni0${
                removePred.map(p => s" WHERE NOT ($p)").getOrElse("")}),
              q AS (
                SELECT vec_id AS query_id, v AS qv, nrm AS qn
                FROM e WHERE vec_id < 20),
              probe AS (
                SELECT query_id, qv, qn, c_label AS cell,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY list_dot_product(qv, cv) / (qn * cn) DESC,
                                  c_label ASC) AS rk
                FROM q CROSS JOIN fcn),
              p1 AS (SELECT query_id, qv, qn, cell FROM probe WHERE rk <= $nprobe),
              sc AS (
                SELECT p.query_id, u.cell, u.vec_id AS neighbor_id,
                       list_dot_product(p.qv, u.v) / (p.qn * u.nrm) AS cos,
                       row_number() OVER (PARTITION BY p.query_id
                         ORDER BY list_dot_product(p.qv, u.v) / (p.qn * u.nrm) DESC,
                                  u.vec_id ASC) AS rank
                FROM p1 p JOIN uni u ON u.cell = p.cell
                WHERE p.query_id <> u.vec_id)
              SELECT query_id, cell, neighbor_id, cos, rank
              FROM sc WHERE rank <= $k ORDER BY query_id, rank"""

  private val storeSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The full durable cycle: train, SAVE the frozen pair as parquet
    * artifacts, RELOAD them, add + serve from the reloaded frames.
    * The serving plan's index lineage is a plain parquet FileScan —
    * no training subtree, not even a leased one (PlanSpec gates it) —
    * which is exactly what a deployment's admission job looks like.
    * Values are bit-identical to [[ivfAddTopK]] (parquet round-trips
    * the long/double/double-array schema exactly; IndexStoreSpec pins
    * the equality), so the same oracle covers both. */
  def ivfStoredTopK(s: SparkSession, d: String, nprobe: Int, k: Int): DataFrame = {
    // per-invocation unique root: a still-lazy DataFrame returned by an
    // earlier invocation must keep reading ITS artifact after a later
    // invocation saves (and concurrent invocations must not race)
    val root = IndexStore.scratchRoot(s, "ivfstore", storeSeq.incrementAndGet())
    val (baseIdx, centroids) = frozenIndex(s, d)
    IndexStore.save(root, "base" -> baseIdx, "centroids" -> centroids)
    addAndServe(s, d,
      IndexStore.load(s, root, "base"), IndexStore.load(s, root, "centroids"),
      nprobe, k)
  }

  val queries: Seq[QueryDef] = Seq(

    // Incremental IVF: train on the base, freeze, assign a shifted-id
    // re-ingest batch in one pass, serve top-5 over the union at
    // nprobe=4. Every query's rank-1 hit is its verbatim twin
    // (cos = 1.0) — the arriving batch is provably searchable without
    // any retraining. IvfAddSpec pins the frozen-assignment invariant
    // (twin cell == frozen-centroid argmax of the identical vector).
    QueryDef(
      "s_ann_ivf_add",
      (s, d) => ivfAddTopK(s, d, nprobe = 4, k = 5),
      Some(ivfAddOracle(nprobe = 4, k = 5))),

    // Durable-index round-trip: the same add + serve, but the frozen
    // index is WRITTEN to parquet and RELOADED before the batch is
    // admitted — the cross-session deployment cycle under the same
    // oracle (the round-trip is value-exact, so the replay is
    // identical to s_ann_ivf_add's). IndexStoreSpec pins
    // reloaded-serve == leased-serve bit-equality in a fresh session.
    QueryDef(
      "s_ann_ivf_stored",
      (s, d) => ivfStoredTopK(s, d, nprobe = 4, k = 5),
      Some(ivfAddOracle(nprobe = 4, k = 5))),

    // FAISS remove_ids(): the deletion half of the index lifecycle
    // (train → add → REMOVE → serve). Tombstones cover base ids 5-9
    // (their verbatim twins keep serving those queries at cos 1) and
    // added ids 1,000,010-1,000,019 (their originals keep serving) —
    // both deletion classes a deployment sees, each provably absent
    // from every result while the rest of the index is untouched.
    // One broadcast anti-join; no retraining, no posting rewrite.
    QueryDef(
      "s_ann_ivf_del",
      (s, d) => {
        import s.implicits._
        val (baseIdx, centroids) = frozenIndex(s, d)
        val tomb = s.range(5, 10).select($"id".as("vec_id"))
          .unionByName(s.range(1000010L, 1000020L).select($"id".as("vec_id")))
        addAndServe(s, d, baseIdx, centroids, nprobe = 4, k = 5, Some(tomb))
      },
      Some(ivfAddOracle(nprobe = 4, k = 5, removePred =
        Some("vec_id BETWEEN 5 AND 9 OR vec_id BETWEEN 1000010 AND 1000019")))),

    // The two removal mechanisms COMPOSED, under s_ann_ivf_del's
    // oracle verbatim: old tombstones (base ids 5-9) are absorbed into
    // the STORED artifact by IndexStore.compact's anti-join rewrite —
    // the serving plan carries no trace of them — while fresh
    // tombstones (the just-added ids 1,000,010+, which the stored base
    // frame cannot contain) ride the live serve-time anti-join. This
    // is the deployment's steady state: compaction periodically folds
    // the accumulated tombstone set into the artifact, and removals
    // since the last compaction stay live — results identical to
    // deleting everything at serve time, which is exactly what the
    // shared oracle asserts.
    QueryDef(
      "s_ann_ivf_compact",
      (s, d) => {
        import s.implicits._
        val root = IndexStore.scratchRoot(s, "ivfcompact",
          storeSeq.incrementAndGet())
        val (baseIdx, centroids) = frozenIndex(s, d)
        // base dumps first (compaction rewrites the STORED frame); the
        // compaction then overlaps the centroid save it never reads
        // (guide §2.6)
        IndexStore.save(root, "base" -> baseIdx)
        Par.all(
          () => IndexStore.save(root, "centroids" -> centroids),
          () => IndexStore.compact(s, root, "base",
            s.range(5, 10).select($"id".as("vec_id"))))
        addAndServe(s, d,
          IndexStore.load(s, root, "base"),
          IndexStore.load(s, root, "centroids"),
          nprobe = 4, k = 5,
          Some(s.range(1000010L, 1000020L).select($"id".as("vec_id"))))
      },
      Some(ivfAddOracle(nprobe = 4, k = 5, removePred =
        Some("vec_id BETWEEN 5 AND 9 OR vec_id BETWEEN 1000010 AND 1000019"))))
  )
}
