package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantized incremental add — the TRUE FAISS `IndexIVFPQ.add()` path,
  * completing the operational closure [[IvfAdd]] opened: where
  * `s_ann_ivf_add` unions RAW vectors into a frozen-centroid index,
  * a deployed IVFADC index stores CODES, so an arriving batch must be
  * ENCODED with the frozen artifacts — assigned a coarse cell by the
  * frozen serving centroids, its residual `v − centroid[cell]` taken
  * against that frozen centroid, and each residual subvector replaced
  * by the id of its nearest FROZEN PQ codeword (the training argmin
  * replayed against the final codebooks, no retraining anywhere). The
  * index grows by a zero-shuffle UNION of (cell, v̂) postings and
  * serving is unchanged from [[IvfPq.ivfPqResTopK]]: probe, scan only
  * probed cells' reconstructions, ADC-rank, exact re-rank.
  *
  * Scale shape: the whole add path is THREE broadcast joins over the
  * increment only — the nlist-row centroid table (coarse assignment +
  * residual), the m-row rolled codebook (per-subspace encode fold,
  * [[ProductQuant.pqCodes]]'s in-row argmax against frozen `cents`),
  * and the m·ksub-row codebook (reconstruction) — so add cost is
  * independent of the existing index size, the property continuous
  * ingest needs at 100 TB. Base training (coarse k-means + residual
  * PQ) runs ONCE behind [[Checkpoints]] leases; nothing downstream of
  * the increment re-instantiates either iterative subtree (PlanSpec
  * gates the add-side plan against training subtrees and windows).
  *
  * IvfPqAddSpec pins the structural frozen-encoding invariants: a
  * verbatim twin's coarse cell equals the frozen-centroid argmax of
  * its (identical) original vector, and its per-subspace codes equal
  * the frozen-book argmax of its residual subvectors — both computed
  * independently in the spec from the collected frozen artifacts (the
  * [[IvfAdd]] lesson: never assert against the last TRAINING round's
  * recorded assignment, which coincides only at convergence).
  */
object IvfPqAdd {
  import Similarity.{IvfIters, IvfNlist, asDouble, dot, l2norm}
  import ProductQuant.{PqDim, PqDsub, PqM}

  /** The frozen artifacts the add path encodes against: the
    * coarse-assigned base corpus (vec_id, v, nrm, cell), its serving
    * centroids (c_label, cv, cn), the residual-trained serving
    * codebook (sub, c_label, cv, cself), and the base corpus's trained
    * codes (vec_id, sub, cell — they feed the base reconstruction
    * only; the ADD path never reads them). All leased — each has two+
    * consumers and two of them close iterative subtrees. */
  case class Frozen(coarse: DataFrame, centroids: DataFrame,
    book: DataFrame, codes: DataFrame)

  private[graft] def frozenArtifacts(s: SparkSession, d: String): Frozen = {
    import s.implicits._
    val emb = table(s, d, "embeddings")
      .select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("nrm", l2norm($"v"))
    val coarse = Checkpoints.lease("ivfpqadd_coarse",
      Similarity.kmeansAssigned(emb))
    val centroids = Checkpoints.lease("ivfpqadd_cents",
      Similarity.quantMeanCv(coarse, Seq("cell"))
        .select($"cell".as("c_label"), $"cv")
        .withColumn("cn", l2norm($"cv")))
    // residuals: r = v − centroid[cell] (broadcast nlist-row join); PQ
    // trains on THEM (the FAISS default, as s_ann_ivfpq_res)
    val resid = coarse
      .join(broadcast(centroids.select($"c_label".as("cell"), $"cv")), Seq("cell"))
      .select($"vec_id", zip_with($"v", $"cv", (a, b) => a - b).as("v"))
    // the lease CARRIES the training-internal `sv` so the codebook
    // aggregate below reads (sub, cell, sv) straight off the
    // materialized assignment — projecting sv away first forced
    // codebookPerSub back onto the corpus-wide (vec_id, sub)
    // reattachment join that round 17 removed from every training
    // round (guide §2.4: the join was 1:1 on the unique key and the
    // assignment already held the columns). The FROZEN artifact keeps
    // its codes-only (vec_id, sub, cell) shape via the projection —
    // consumers and the parquet dumps see exactly the historical frame.
    val codesSv = Checkpoints.lease("ivfpqadd_codes", ProductQuant.pqCodes(resid))
    val codes = codesSv.select(col("vec_id"), col("sub"), col("cell"))
    val book = Checkpoints.lease("ivfpqadd_book",
      ProductQuant.codebookPerSub(ProductQuant.subvectors(resid), codesSv))
    Frozen(coarse, centroids, book, codes)
  }

  /** Reconstruction of a (vec_id, sub, cell) code table against the
    * frozen book: flatten the subspace codewords in subspace order. */
  private def reconOf(codes: DataFrame, book: DataFrame): DataFrame =
    codes.join(broadcast(book.select(col("sub"), col("c_label").as("cell"), col("cv"))),
        Seq("sub", "cell"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("cv")))),
        p => p.getField("cv"))).as("recon"))

  /** Per-subspace frozen-book encoding of a (vec_id, v) residual frame
    * — the training assignment step's in-row argmax fold, run ONCE
    * against the final codebooks instead of per round. */
  private[graft] def encodeAgainst(resid: DataFrame, book: DataFrame): DataFrame = {
    val rolled = book.groupBy(col("sub")).agg(array_sort(collect_list(
      struct(col("c_label"), col("cv"), col("cself")))).as("cents"))
    ProductQuant.subvectors(resid).join(broadcast(rolled), Seq("sub"))
      .select(col("vec_id"), col("sub"),
        aggregate(col("cents"),
          struct(lit(Long.MaxValue).as("cell"),
            lit(Double.NegativeInfinity).as("best")),
          (acc, c) => {
            val score = dot(col("sv"), c.getField("cv")) -
              lit(0.5) * c.getField("cself")
            when(score > acc.getField("best"),
              struct(c.getField("c_label").as("cell"), score.as("best")))
              .otherwise(acc)
          }).getField("cell").as("cell"))
  }

  /** add() step 1: ONE coarse assignment pass of an arriving
    * (vec_id, v, nrm) batch against the frozen serving centroids
    * ([[IvfAdd]]'s fold — cosine argmax over nondegenerate cells,
    * strictly-greater keep = (score DESC, cell ASC)). */
  private[graft] def assignCoarse(inc: DataFrame, centroids: DataFrame): DataFrame = {
    val cents1 = centroids.filter(col("cn") > 0)
      .groupBy().agg(array_sort(collect_list(
        struct(col("c_label"), col("cv"), col("cn")))).as("cents"))
    inc.crossJoin(broadcast(cents1))
      .filter(size(col("cents")) > 0)
      .select(col("vec_id"), col("v"), col("nrm"),
        aggregate(col("cents"),
          struct(lit(Long.MaxValue).as("cell"),
            lit(Double.NegativeInfinity).as("best")),
          (acc, c) => {
            val score = dot(col("v"), c.getField("cv")) / c.getField("cn")
            when(score > acc.getField("best"),
              struct(c.getField("c_label").as("cell"), score.as("best")))
              .otherwise(acc)
          }).getField("cell").as("cell"))
  }

  /** add() step 2: residual against the ASSIGNED frozen centroid. */
  private[graft] def residualOf(assigned: DataFrame, centroids: DataFrame): DataFrame =
    assigned
      .join(broadcast(centroids.select(col("c_label").as("cell"), col("cv"))),
        Seq("cell"))
      .select(col("vec_id"), zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))

  def ivfPqAddTopK(
      s: SparkSession, d: String, nprobe: Int, m: Int, k: Int): DataFrame =
    pqAddAndServe(s, frozenArtifacts(s, d), nprobe, m, k)

  private val pqStoreSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The durable cycle for the QUANTIZED index — `s_ann_ivf_stored`'s
    * shape applied to the full IVFADC artifact set: all four frozen
    * frames (coarse-assigned base, serving centroids, residual
    * codebook, base codes) are parquet-dumped via [[IndexStore]] and
    * RELOADED before the batch is encoded and served. Values are
    * bit-identical to [[ivfPqAddTopK]] (parquet round-trips the
    * long/double/double-array schemas exactly), so the same oracle
    * covers both; the reloaded artifacts' lineage is a plain parquet
    * FileScan — no k-means subtree, no PQ-training subtree, not even
    * a lease (PlanSpec gates it). */
  def ivfPqStoredTopK(
      s: SparkSession, d: String, nprobe: Int, m: Int, k: Int): DataFrame = {
    val root = IndexStore.scratchRoot(s, "pqstore", pqStoreSeq.incrementAndGet())
    val f = frozenArtifacts(s, d)
    IndexStore.save(root, "coarse" -> f.coarse, "centroids" -> f.centroids,
      "book" -> f.book, "codes" -> f.codes)
    pqAddAndServe(s, Frozen(
      IndexStore.load(s, root, "coarse"),
      IndexStore.load(s, root, "centroids"),
      IndexStore.load(s, root, "book"),
      IndexStore.load(s, root, "codes")), nprobe, m, k)
  }

  /** The add + serve path against a GIVEN frozen artifact set — the
    * part a deployment re-runs per arriving batch, agnostic to whether
    * the artifacts come from the in-session lease (s_ann_ivfpq_add) or
    * a reloaded [[IndexStore]] dump (s_ann_ivfpq_stored). */
  private[graft] def pqAddAndServe(
      s: SparkSession, frozen: Frozen, nprobe: Int, m: Int, k: Int,
      tombstones: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val Frozen(coarse, centroids, book, baseCodes) = frozen
    // base index: v̂ = centroid[cell] + recon(residual codes)
    val withVhat = (idx: DataFrame) => idx
      .join(broadcast(centroids.select($"c_label".as("cell"), $"cv".as("ccv"))),
        Seq("cell"))
      .withColumn("vhat", zip_with($"ccv", $"recon", (a, b) => a + b))
      .withColumn("hn", l2norm($"vhat"))
      .select($"cell", $"vec_id", $"v", $"nrm", $"vhat", $"hn")
    val baseIdx = withVhat(coarse.join(reconOf(baseCodes, book), Seq("vec_id")))
    // THE ARRIVING BATCH: first 30 base vectors under shifted ids (the
    // deterministic-positive convention), encoded with frozen artifacts
    val inc = coarse.select($"vec_id", $"v", $"nrm")
      .filter($"vec_id" < 30)
      .withColumn("vec_id", $"vec_id" + 1000000L)
    // add() steps 1-3: coarse assign, residual, frozen-book encode,
    // reconstruct v̂ = centroid + recon — no retraining anywhere
    val incAssigned = assignCoarse(inc, centroids)
    val incIdx = withVhat(incAssigned
      .join(reconOf(encodeAgainst(residualOf(incAssigned, centroids), book), book),
        Seq("vec_id")))
    // append-only union index: co-shaped projections, zero shuffle;
    // leased — serving reads it three times (queries, ADC, re-rank).
    // FAISS remove_ids(): deletion is one broadcast anti-join against
    // the tombstone id set BEFORE the lease — no rebuild, no code
    // rewrite, no retraining of quantizer or codebooks (the same
    // closure the raw-IVF family carries via s_ann_ivf_del)
    val index0 = Checkpoints.lease("ivfpqadd_idx", baseIdx.unionByName(incIdx))
    val index = tombstones
      .map(t => index0.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(index0)
    // serving, unchanged from ivfPqResTopK
    // queries come from the COARSE frame, not the index: remove_ids()
    // (live anti-join) and codes-frame compaction both delete an id as
    // a NEIGHBOR only — the query set is external to the index (for an
    // untombstoned run this is the same (vec_id, v, nrm) row set the
    // index's base side carries, so values are unchanged)
    val q = coarse.filter($"vec_id" < 20 && $"nrm" > 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val wProbe = Window.partitionBy($"query_id")
      .orderBy($"c_cos".desc, $"c_label".asc)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("c_cos", dot($"qv", $"cv") / ($"qn" * $"cn"))
      .withColumn("rk", row_number().over(wProbe))
      .filter($"rk" <= nprobe)
      .select($"query_id", $"qv", $"qn", $"c_label".as("cell"))
    val wAdc = Window.partitionBy($"query_id")
      .orderBy($"cos_adc".desc, $"neighbor_id".asc)
    val cand = broadcast(probed)
      .join(index.filter($"hn" > 0)
        .select($"cell", $"vec_id".as("neighbor_id"), $"vhat", $"hn"), Seq("cell"))
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"cell", $"neighbor_id",
        (dot($"qv", $"vhat") / ($"qn" * $"hn")).as("cos_adc"))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter($"adc_rank" <= m)
    val wTop = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    broadcast(cand)
      .join(index.filter($"nrm" > 0)
        .select($"vec_id".as("neighbor_id"), $"v".as("cv2"), $"nrm".as("cn2")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select($"query_id", $"cell", $"neighbor_id", $"cos_adc", $"adc_rank",
        (dot($"qv", $"cv2") / ($"qn" * $"cn2")).as("cos"))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cell", $"neighbor_id", $"cos",
        $"cos_adc", $"adc_rank")
      .orderBy($"query_id", $"rank")
  }

  /** DuckDB replay of [[ivfPqAddTopK]]: the base is
    * [[IvfPq.ivfPqResTopK]]'s replay verbatim (k-means fragment,
    * residual CTE, PQ fragment on the residuals, v̂ join); the add path
    * chains the frozen-centroid assignment (`isc`/`ia`, the
    * [[IvfAdd]] oracle's shape), the frozen-centroid residual, the
    * frozen-book per-subspace argmax (`icsc`/`icd` — the training
    * round's row_number form against the FINAL `p_fcb`), the
    * reconstruction, and the UNION ALL index; serving is the standard
    * probe → cell-bounded ADC → exact re-rank over the union. */
  private def ivfPqAddOracle(nprobe: Int, m: Int, k: Int,
      removePred: Option[String] = None): String = {
    val dim = PqDim
    s"""WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm
                FROM embeddings),
              ${Similarity.kmeansOracleCtes(IvfNlist, IvfIters)},
              ${Similarity.ivfCentroidCtes(IvfIters)},
              re AS (
                SELECT e.vec_id,
                       [e.v[i + 1] - f.cv[i + 1] for i in range($dim)] AS v
                FROM e
                JOIN asn$IvfIters a ON a.vec_id = e.vec_id
                JOIN fcn f ON f.c_label = a.cell),
              ${ProductQuant.pqOracleCtes("p_", in = "re")},
              vh AS (
                SELECT r.vec_id,
                       [f.cv[i + 1] + r.rv[i + 1] for i in range($dim)] AS hv
                FROM p_rcn r
                JOIN asn$IvfIters a ON a.vec_id = r.vec_id
                JOIN fcn f ON f.c_label = a.cell),
              base AS (
                SELECT a.cell, e.vec_id, e.v, e.nrm, r.hv,
                       sqrt(list_dot_product(r.hv, r.hv)) AS hn
                FROM e
                JOIN asn$IvfIters a ON a.vec_id = e.vec_id
                JOIN vh r ON r.vec_id = e.vec_id),
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
              ire AS (
                SELECT i.vec_id,
                       [i.v[j + 1] - f.cv[j + 1] for j in range($dim)] AS v
                FROM inc i
                JOIN ia ON ia.vec_id = i.vec_id
                JOIN fcn f ON f.c_label = ia.cell),
              isv AS (
                SELECT vec_id, s AS sub, v[s*$PqDsub+1 : s*$PqDsub+$PqDsub] AS sv
                FROM (SELECT vec_id, v, unnest(range(0, $PqM)) AS s FROM ire)),
              icsc AS (
                SELECT s.vec_id, s.sub, c.cell,
                       row_number() OVER (PARTITION BY s.vec_id, s.sub
                         ORDER BY list_dot_product(s.sv, c.cv)
                                    - 0.5 * list_dot_product(c.cv, c.cv) DESC,
                                  c.cell ASC) AS rk
                FROM isv s JOIN p_fcb c ON c.sub = s.sub),
              icd AS (SELECT vec_id, sub, cell FROM icsc WHERE rk = 1),
              irc AS (
                SELECT a.vec_id, flatten(list(c.cv ORDER BY a.sub)) AS rv
                FROM icd a JOIN p_fcb c ON c.sub = a.sub AND c.cell = a.cell
                GROUP BY a.vec_id),
              ivh AS (
                SELECT i.vec_id, ia.cell, i.v, i.nrm,
                       [f.cv[j + 1] + r.rv[j + 1] for j in range($dim)] AS hv
                FROM inc i
                JOIN ia ON ia.vec_id = i.vec_id
                JOIN fcn f ON f.c_label = ia.cell
                JOIN irc r ON r.vec_id = i.vec_id),
              uni0 AS (
                SELECT cell, vec_id, v, nrm, hv, hn FROM base
                UNION ALL
                SELECT cell, vec_id, v, nrm, hv,
                       sqrt(list_dot_product(hv, hv)) AS hn
                FROM ivh),
              uni AS (SELECT * FROM uni0${
                removePred.map(p => s" WHERE NOT ($p)").getOrElse("")}),
              q AS (
                SELECT vec_id AS query_id, v AS qv, nrm AS qn
                FROM e WHERE vec_id < 20 AND nrm > 0),
              probe AS (
                SELECT query_id, qv, qn, c_label AS cell,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY list_dot_product(qv, cv) / (qn * cn) DESC,
                                  c_label ASC) AS rk
                FROM q CROSS JOIN fcn),
              p1 AS (SELECT query_id, qv, qn, cell FROM probe WHERE rk <= $nprobe),
              adc AS (
                SELECT p.query_id, u.cell, u.vec_id AS neighbor_id,
                       list_dot_product(p.qv, u.hv) / (p.qn * u.hn) AS cos_adc
                FROM p1 p JOIN uni u ON u.cell = p.cell
                WHERE p.query_id <> u.vec_id AND u.hn > 0),
              r1 AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_adc DESC, neighbor_id ASC) AS adc_rank
                FROM adc),
              cand AS (SELECT * FROM r1 WHERE adc_rank <= $m),
              r2 AS (
                SELECT c.query_id, c.cell, c.neighbor_id, c.cos_adc, c.adc_rank,
                       list_dot_product(qq.qv, u.v) / (qq.qn * u.nrm) AS cos,
                       row_number() OVER (PARTITION BY c.query_id
                         ORDER BY list_dot_product(qq.qv, u.v) / (qq.qn * u.nrm) DESC,
                                  c.neighbor_id ASC) AS rank
                FROM cand c
                JOIN uni u ON u.vec_id = c.neighbor_id AND u.nrm > 0
                JOIN q qq ON qq.query_id = c.query_id)
              SELECT query_id, rank, cell, neighbor_id, cos, cos_adc, adc_rank
              FROM r2 WHERE rank <= $k ORDER BY query_id, rank"""
  }

  val queries: Seq[QueryDef] = Seq(

    // Quantized incremental add at the family's (nprobe=4, m=10, k=5):
    // train residual IVF-PQ on the base, FREEZE centroids + codebooks,
    // encode a shifted-id re-ingest batch through the three broadcast
    // passes (coarse assign, residual, subspace code lookup), serve
    // top-5 over the union. IvfPqAddSpec pins the frozen-encoding
    // invariants; PlanSpec gates the add path against training
    // subtrees.
    QueryDef(
      "s_ann_ivfpq_add",
      (s, d) => ivfPqAddTopK(s, d, nprobe = 4, m = 10, k = 5),
      Some(ivfPqAddOracle(nprobe = 4, m = 10, k = 5))),

    // Durable-index round-trip for the QUANTIZED index: the same
    // encode + serve, but all four frozen artifacts are WRITTEN to
    // parquet and RELOADED first — the cross-session deployment cycle
    // under the same oracle (the round-trip is value-exact).
    // IndexStoreSpec pins reloaded-serve == leased-serve bit-equality
    // in a fresh session.
    QueryDef(
      "s_ann_ivfpq_stored",
      (s, d) => ivfPqStoredTopK(s, d, nprobe = 4, m = 10, k = 5),
      Some(ivfPqAddOracle(nprobe = 4, m = 10, k = 5))),

    // FAISS remove_ids() on the QUANTIZED index — closing the family
    // symmetry with s_ann_ivf_del: tombstone both base ids 5-9 (their
    // shifted twins keep serving) and added ids 1,000,010-1,000,019
    // (their originals keep serving), the two deletion classes a
    // deployment sees. One broadcast anti-join over the union index;
    // codes, codebooks, and quantizer untouched — compaction, when the
    // tombstone fraction grows, is IndexStore.compact's rewrite of the
    // stored codes frame, never a retrain.
    QueryDef(
      "s_ann_ivfpq_del",
      (s, d) => {
        import s.implicits._
        val tomb = s.range(5, 10).select($"id".as("vec_id"))
          .unionByName(s.range(1000010L, 1000020L).select($"id".as("vec_id")))
        pqAddAndServe(s, frozenArtifacts(s, d), nprobe = 4, m = 10, k = 5,
          tombstones = Some(tomb))
      },
      Some(ivfPqAddOracle(nprobe = 4, m = 10, k = 5, removePred =
        Some("vec_id BETWEEN 5 AND 9 OR vec_id BETWEEN 1000010 AND 1000019")))),

    // The two removal mechanisms COMPOSED on the QUANTIZED index —
    // the PQ twin of s_ann_ivf_compact, under s_ann_ivfpq_del's
    // oracle verbatim: old tombstones (base ids 5-9) folded into the
    // STORED codes frame by IndexStore.compact (the inner join from
    // coarse to reconstructed codes then drops them from the index;
    // quantizer, codebooks, and every surviving code untouched),
    // fresh tombstones (the just-added ids, absent from any stored
    // frame by construction) riding the live serve-time anti-join.
    QueryDef(
      "s_ann_ivfpq_compact",
      (s, d) => {
        import s.implicits._
        val root = IndexStore.scratchRoot(s, "pqcompact",
          pqStoreSeq.incrementAndGet())
        val f = frozenArtifacts(s, d)
        // codes dumps first (compaction rewrites the STORED frame);
        // the compaction then overlaps the three saves it does not
        // read (guide §2.6 — all four are independent jobs over
        // leased frames, only driver sequencing serialized them)
        IndexStore.save(root, "codes" -> f.codes)
        Par.all(
          () => IndexStore.save(root, "coarse" -> f.coarse,
            "centroids" -> f.centroids, "book" -> f.book),
          () => IndexStore.compact(s, root, "codes",
            s.range(5, 10).select($"id".as("vec_id"))))
        pqAddAndServe(s, Frozen(
          IndexStore.load(s, root, "coarse"),
          IndexStore.load(s, root, "centroids"),
          IndexStore.load(s, root, "book"),
          IndexStore.load(s, root, "codes")), nprobe = 4, m = 10, k = 5,
          tombstones = Some(
            s.range(1000010L, 1000020L).select($"id".as("vec_id"))))
      },
      Some(ivfPqAddOracle(nprobe = 4, m = 10, k = 5, removePred =
        Some("vec_id BETWEEN 5 AND 9 OR vec_id BETWEEN 1000010 AND 1000019"))))
  )
}
