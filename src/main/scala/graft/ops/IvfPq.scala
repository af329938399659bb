package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed serving shape real vector stores run at
  * 100 TB (FAISS `IndexIVFPQ`, ScaNN's partitioned-AH): the trained
  * coarse quantizer bounds WHICH partitions a query touches
  * (nprobe / nlist of the corpus), and product-quantized codes bound
  * the BYTES each touched partition reads (the reconstruction is
  * m × 4-bit codes against a broadcast codebook), with the exact
  * float re-rank confined to the top-`m` candidates per query. Both
  * halves are the engine's existing trained operators — the coarse
  * cells are [[Similarity.kmeansCells]] (the `s_ann_ivf*` quantizer)
  * and the reconstructions are [[ProductQuant.pqRecon]] (the
  * `s_ann_pq` codebooks, trained on the RAW vectors — the
  * non-residual PQ variant, which keeps both training replays
  * independent; residual encoding would nest one inside the other) —
  * so the composition introduces no new training machinery, only the
  * serving join that reads codes cell-bounded.
  *
  * Scale shape: the index build materializes ONCE behind a
  * [[Checkpoints]] lease (cells + reconstructions joined by id); the
  * serving plan broadcasts the nlist-row centroid table and the
  * probed query set, scans only probed cells' (id, recon) rows, and
  * re-ranks by two id equi-joins. The oracle replays BOTH trainings
  * (the unrolled Lloyd rounds of each fragment, composable because
  * the PQ fragment's CTE names are prefixed) plus the probe, the
  * cell-bounded ADC, and the re-rank — value-identical end to end.
  */
object IvfPq {
  import Similarity.{IvfIters, IvfNlist, asDouble, dot, l2norm}

  def ivfPqTopK(
      s: SparkSession, d: String, nprobe: Int, m: Int, k: Int): DataFrame = {
    import s.implicits._
    val emb = table(s, d, "embeddings")
      .select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("nrm", l2norm($"v"))
    // INDEX BUILD, materialized once: coarse cell + PQ reconstruction
    // per corpus vector. Both trainings run once; the lease truncates
    // the two iterative subtrees exactly as the standalone queries do.
    // coarse cells ride the broadcast-map assignment (no corpus-wide
    // vec_id reattachment join — Similarity.kmeansAssigned); only the
    // PQ reconstruction (keyed by its own vec_id groupBy) still joins.
    // The two trainings are INDEPENDENT here (non-residual PQ trains
    // on the raw vectors, not on k-means residuals), so their
    // iterative job chains run CONCURRENTLY (guide §2.6): each chain
    // is a sequence of small blocking broadcast-build jobs that leave
    // most of the box idle, and only driver sequencing serialized one
    // chain after the other. The k-means chain materializes into the
    // trained 1-row centroid table (nlist structs — KB-scale blocks);
    // the corpus assignment below is the same broadcast in-row argmax
    // against it, value-identical to the inlined form.
    val (cents, recon) = Par.join2(
      Checkpoints.lease("ivfpq_cents", Similarity.kmeansCents(emb)),
      ProductQuant.pqRecon(emb.select($"vec_id", $"v")))
    val index = Checkpoints.lease("ivfpq",
      Similarity.withNearestCell(emb, cents).join(recon, Seq("vec_id")))
    // serving centroids of the trained cells (quantized mean — the
    // same stage ivfProbedWith runs; zero-norm centroids kept)
    val centroids = Similarity.quantMeanCv(index, Seq("cell"))
      .select($"cell".as("c_label"), $"cv")
      .withColumn("cn", l2norm($"cv"))
    val q = index.filter($"vec_id" < 20 && $"nrm" > 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val wProbe = Window.partitionBy($"query_id")
      .orderBy($"c_cos".desc, $"c_label".asc)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("c_cos", dot($"qv", $"cv") / ($"qn" * $"cn"))
      .withColumn("rk", row_number().over(wProbe))
      .filter($"rk" <= nprobe)
      .select($"query_id", $"qv", $"qn", $"c_label".as("cell"))
    // ADC over the probed cells' members: reads (cell, id, recon) only
    val wAdc = Window.partitionBy($"query_id")
      .orderBy($"cos_adc".desc, $"neighbor_id".asc)
    val cand = broadcast(probed)
      .join(index.filter($"rn" > 0)
        .select($"cell", $"vec_id".as("neighbor_id"), $"recon", $"rn"), Seq("cell"))
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"cell", $"neighbor_id",
        (dot($"qv", $"recon") / ($"qn" * $"rn")).as("cos_adc"))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter($"adc_rank" <= m)
    // exact float re-rank by id equi-join (cn > 0 — the family's
    // zero-vector NaN gate)
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

  /** DuckDB replay of [[ivfPqTopK]]: both trainings' unrolled rounds
    * (the PQ fragment prefixed `p_` so the round CTE names don't
    * collide with the k-means fragment's), then probe → cell-bounded
    * ADC → exact re-rank. */
  private def ivfPqOracle(nprobe: Int, m: Int, k: Int): String =
    s"""WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm
                FROM embeddings),
              ${Similarity.kmeansOracleCtes(IvfNlist, IvfIters)},
              ${Similarity.ivfCentroidCtes(IvfIters)},
              ${ProductQuant.pqOracleCtes("p_")},
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
              mem AS (
                SELECT a.cell, r.vec_id, r.rv, r.rn
                FROM p_rcn r JOIN asn$IvfIters a ON a.vec_id = r.vec_id
                WHERE r.rn > 0),
              adc AS (
                SELECT p.query_id, mm.cell, mm.vec_id AS neighbor_id,
                       list_dot_product(p.qv, mm.rv) / (p.qn * mm.rn) AS cos_adc
                FROM p1 p JOIN mem mm ON mm.cell = p.cell
                WHERE p.query_id <> mm.vec_id),
              r1 AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_adc DESC, neighbor_id ASC) AS adc_rank
                FROM adc),
              cand AS (SELECT * FROM r1 WHERE adc_rank <= $m),
              r2 AS (
                SELECT c.query_id, c.cell, c.neighbor_id, c.cos_adc, c.adc_rank,
                       list_dot_product(qq.qv, e.v) / (qq.qn * e.nrm) AS cos,
                       row_number() OVER (PARTITION BY c.query_id
                         ORDER BY list_dot_product(qq.qv, e.v) / (qq.qn * e.nrm) DESC,
                                  c.neighbor_id ASC) AS rank
                FROM cand c
                JOIN e ON e.vec_id = c.neighbor_id AND e.nrm > 0
                JOIN q qq ON qq.query_id = c.query_id)
              SELECT query_id, rank, cell, neighbor_id, cos, cos_adc, adc_rank
              FROM r2 WHERE rank <= $k ORDER BY query_id, rank"""

  /** RESIDUAL IVF-PQ — FAISS `IndexIVFPQ`'s DEFAULT encoding, the
    * refinement [[ivfPqTopK]]'s doc names as the deliberate gap: PQ
    * trains on the RESIDUAL `v − centroid[cell]` instead of the raw
    * vector, so the codebooks spend their 4-bit budget on the
    * within-cell variation the coarse quantizer already removed the
    * bulk of — worth ~1-2 bits of effective precision at equal code
    * size. Serving reconstructs `v̂ = centroid[cell] + recon(r)` and
    * scores ADC against `v̂`; the probe, cell-bounded scan, and exact
    * re-rank are identical to the non-residual query.
    *
    * The two trainings NEST here (the PQ input depends on the k-means
    * output), which is exactly why the oracle needed the
    * [[ProductQuant.pqOracleCtes]] input-CTE parameter: the replay runs
    * the k-means fragment, derives the residual CTE from its final
    * assignment + serving centroids, and feeds THAT to the PQ fragment
    * — both trainings still replay value-identically, just chained
    * instead of independent.
    *
    * Scale shape: unchanged from [[ivfPqTopK]] — the coarse
    * assignment-joined corpus leases once (residual derivation and
    * serving centroids both read it), the composed index (cell + v̂)
    * leases once, serving broadcasts nlist centroids and probed
    * queries, scans only probed cells, re-ranks by id equi-joins. The
    * residual subtraction is one broadcast nlist-row join + a zip_with
    * map — no new shuffle anywhere. */
  def ivfPqResTopK(
      s: SparkSession, d: String, nprobe: Int, m: Int, k: Int): DataFrame = {
    import s.implicits._
    val emb = table(s, d, "embeddings")
      .select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("nrm", l2norm($"v"))
    // coarse stage, materialized once: the assignment-joined corpus
    // feeds the serving centroids AND the residual derivation
    val coarse = Checkpoints.lease("ivfpq_res_coarse",
      Similarity.kmeansAssigned(emb))
    // nlist-row centroid table, leased: three consumers (residual
    // derivation, index v̂ join, probe) must not each re-run the
    // corpus-wide centroid aggregate
    val centroids = Checkpoints.lease("ivfpq_res_cents",
      Similarity.quantMeanCv(coarse, Seq("cell"))
        .select($"cell".as("c_label"), $"cv")
        .withColumn("cn", l2norm($"cv")))
    // residuals: r = v − centroid[cell] (broadcast nlist-row join)
    val resid = coarse
      .join(broadcast(centroids.select($"c_label".as("cell"), $"cv")), Seq("cell"))
      .select($"vec_id", zip_with($"v", $"cv", (a, b) => a - b).as("v"))
    // PQ trained ON the residuals; index carries v̂ = centroid + recon(r)
    val index = Checkpoints.lease("ivfpq_res", coarse
      .join(ProductQuant.pqRecon(resid), Seq("vec_id"))
      .join(broadcast(centroids.select($"c_label".as("cell"), $"cv".as("ccv"))),
        Seq("cell"))
      .withColumn("vhat", zip_with($"ccv", $"recon", (a, b) => a + b))
      .withColumn("hn", l2norm($"vhat"))
      .select($"cell", $"vec_id", $"v", $"nrm", $"vhat", $"hn"))
    val q = index.filter($"vec_id" < 20 && $"nrm" > 0)
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

  /** DuckDB replay of [[ivfPqResTopK]]: the k-means fragment, the
    * residual CTE off its final assignment + serving centroids, the PQ
    * fragment fed the residuals (`in = "re"`), reconstruction
    * `v̂ = centroid + recon(r)`, then probe → cell-bounded ADC → exact
    * re-rank. Element-wise list arithmetic is the mm_features
    * comprehension pattern; subtraction order matches the Spark
    * zip_with exactly (v[i] − cv[i], then cv[i] + rv[i]). */
  private def ivfPqResOracle(nprobe: Int, m: Int, k: Int): String = {
    val dim = ProductQuant.PqDim
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
              vhn AS (
                SELECT vec_id, hv, sqrt(list_dot_product(hv, hv)) AS hn
                FROM vh),
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
              mem AS (
                SELECT a.cell, r.vec_id, r.hv, r.hn
                FROM vhn r JOIN asn$IvfIters a ON a.vec_id = r.vec_id
                WHERE r.hn > 0),
              adc AS (
                SELECT p.query_id, mm.cell, mm.vec_id AS neighbor_id,
                       list_dot_product(p.qv, mm.hv) / (p.qn * mm.hn) AS cos_adc
                FROM p1 p JOIN mem mm ON mm.cell = p.cell
                WHERE p.query_id <> mm.vec_id),
              r1 AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_adc DESC, neighbor_id ASC) AS adc_rank
                FROM adc),
              cand AS (SELECT * FROM r1 WHERE adc_rank <= $m),
              r2 AS (
                SELECT c.query_id, c.cell, c.neighbor_id, c.cos_adc, c.adc_rank,
                       list_dot_product(qq.qv, e.v) / (qq.qn * e.nrm) AS cos,
                       row_number() OVER (PARTITION BY c.query_id
                         ORDER BY list_dot_product(qq.qv, e.v) / (qq.qn * e.nrm) DESC,
                                  c.neighbor_id ASC) AS rank
                FROM cand c
                JOIN e ON e.vec_id = c.neighbor_id AND e.nrm > 0
                JOIN q qq ON qq.query_id = c.query_id)
              SELECT query_id, rank, cell, neighbor_id, cos, cos_adc, adc_rank
              FROM r2 WHERE rank <= $k ORDER BY query_id, rank"""
  }

  val queries: Seq[QueryDef] = Seq(

    // IVF-PQ ANN: trained coarse cells (nlist=10, 4 Lloyd rounds)
    // bound the scan to nprobe=4 cells per query; PQ reconstructions
    // (8 subspaces x 16 centroids) score the members; top-10 re-rank
    // exact, top-5 out. IvfPqSpec pins recall >= the pure-PQ query's
    // on the probed fraction and spot-checks the cell bound.
    QueryDef(
      "s_ann_ivfpq",
      (s, d) => ivfPqTopK(s, d, nprobe = 4, m = 10, k = 5),
      Some(ivfPqOracle(nprobe = 4, m = 10, k = 5))),

    // RESIDUAL IVF-PQ at the same (nprobe, m, k) as s_ann_ivfpq, so
    // the two are directly comparable: same probe set, same code
    // budget, finer codebooks (trained on within-cell residuals).
    // IvfPqSpec pins recall@5 >= the non-residual query's.
    QueryDef(
      "s_ann_ivfpq_res",
      (s, d) => ivfPqResTopK(s, d, nprobe = 4, m = 10, k = 5),
      Some(ivfPqResOracle(nprobe = 4, m = 10, k = 5)))
  )
}
