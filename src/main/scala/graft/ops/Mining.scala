package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hard-negative mining — the contrastive-training data op (DPR/ANCE
  * style): for each query vector, the top-k most-similar corpus
  * vectors that carry a DIFFERENT label. Those are the "hard"
  * negatives — near the query in embedding space but semantically
  * wrong — and mining them is what makes a retriever's negative set
  * informative (random negatives are trivially separable).
  *
  * Mined the way a 100 TB pipeline actually runs it (ANCE's
  * ANN-index mining): NOT a label-filtered brute-force pass, but the
  * trained-IVF serving shape — probe `nprobe` cells per query, scan
  * only the probed postings, apply the label exclusion IN the
  * candidate scan (the filter rides the cell equi-join, so wrong-kind
  * candidates never reach the ranking window), top-k per query. At
  * nprobe = nlist the cell bound is vacuous and the result provably
  * equals the label-excluded brute force (MiningSpec pins it) — the
  * same honesty argument the IVF family's recall specs use.
  *
  * Scale shape: identical to `s_ann_ivf` (leased one-shot index
  * build, broadcast nlist-row centroid probe, cell-bounded postings
  * scan, per-query top-k window over ≤ nprobe/nlist of the corpus)
  * plus one pushed-down label predicate — mining cost per query does
  * not grow with corpus labels, and the index is the SAME artifact
  * the serving queries use (one build amortizes retrieval AND
  * mining, exactly how an alternating ANCE training loop consumes
  * it).
  */
object Mining {
  import Similarity.{IvfIters, IvfNlist, asDouble, dot, l2norm}

  /** The labeled trained-index frame the mining pass runs against:
    * (vec_id, label, v, nrm, cell) — the s_ann_ivf build joined with
    * the corpus labels. The durable artifact `s_hard_negatives_stored`
    * dumps/reloads (every value is a long/string/double — parquet
    * round-trips it exactly). */
  private def labeledIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val embBase = table(s, d, "embeddings")
      .select($"vec_id", $"label", asDouble($"embedding").as("v"))
      .withColumn("nrm", l2norm($"v"))
    // broadcast-map assignment — no corpus-wide vec_id reattachment
    // join (see Similarity.kmeansAssigned)
    Similarity.kmeansAssigned(embBase)
  }

  /** The serving centroids recomputed from a labeled index frame's
    * recorded cells — the same fixed-point integer averaging the IVF
    * family serves by. */
  private def centroidsOf(idx: DataFrame): DataFrame = {
    import idx.sparkSession.implicits._
    Similarity.quantMeanCv(idx, Seq("cell"))
      .select($"cell".as("c_label"), $"cv")
      .withColumn("cn", l2norm($"cv"))
  }

  def hardNegativesTopK(
      s: SparkSession, d: String, nprobe: Int, k: Int): DataFrame = {
    // one-shot trained index (the s_ann_ivf build), leased: centroid
    // recompute, query projection, and postings scan all read it
    val idx = Checkpoints.lease("hardneg", labeledIndex(s, d))
    mineFromIndex(s, idx, centroidsOf(idx), nprobe, k)
  }

  private val mineStoreSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The durable round-trip for the MINING consumer — the family
    * convention applied to the index's second reader: the labeled
    * trained index is SAVED as a parquet artifact, RELOADED, and
    * mined with zero training lineage. The serving centroids are
    * derived FROM the stored primary and stored alongside it (the
    * dd_lsh_stored bands convention — the payload scans once), so an
    * alternating ANCE loop's mining job is two parquet scans with no
    * knowledge of how the index was trained. Values bit-identical to
    * [[hardNegativesTopK]] — parquet round-trips every stored
    * long/double/double-array exactly and the downstream arithmetic
    * is shared — so `s_hard_negatives_stored` runs under the same
    * oracle verbatim (MiningSpec pins the equality). */
  def hardNegativesStoredTopK(
      s: SparkSession, d: String, nprobe: Int, k: Int): DataFrame = {
    val root = IndexStore.scratchRoot(s, "minestore",
      mineStoreSeq.incrementAndGet())
    IndexStore.save(root, "mine_base" -> labeledIndex(s, d))
    val base = IndexStore.load(s, root, "mine_base")
    IndexStore.save(root, "mine_centroids" -> centroidsOf(base))
    mineFromIndex(s,
      IndexStore.load(s, root, "mine_base"),
      IndexStore.load(s, root, "mine_centroids"),
      nprobe, k)
  }

  /** The mining serve over a built OR reloaded labeled index frame
    * plus its serving centroids: nprobe-bounded probe, label-excluded
    * cell-bounded top-k. */
  private def mineFromIndex(
      s: SparkSession, idx: DataFrame, centroids: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    import s.implicits._
    val q = idx.filter($"vec_id" < 20 && $"nrm" > 0)
      .select($"vec_id".as("query_id"), $"label".as("q_label"),
        $"v".as("qv"), $"nrm".as("qn"))
    val wProbe = Window.partitionBy($"query_id")
      .orderBy($"c_cos".desc, $"c_label".asc)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("c_cos", dot($"qv", $"cv") / ($"qn" * $"cn"))
      .withColumn("rk", row_number().over(wProbe))
      .filter($"rk" <= nprobe)
      .select($"query_id", $"q_label", $"qv", $"qn", $"c_label".as("cell"))
    // candidate scan: probed postings only, label exclusion + the
    // zero-norm gate applied before anything is scored
    val wTop = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    broadcast(probed)
      .join(idx.filter($"nrm" > 0)
        .select($"cell", $"vec_id".as("neighbor_id"),
          $"label".as("n_label"), $"v".as("cv2"), $"nrm".as("cn2")), Seq("cell"))
      .filter($"query_id" =!= $"neighbor_id" && $"n_label" =!= $"q_label")
      .select($"query_id", $"q_label", $"neighbor_id", $"n_label",
        (dot($"qv", $"cv2") / ($"qn" * $"cn2")).as("cos"))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= k)
      .select($"query_id", $"q_label", $"rank", $"neighbor_id", $"n_label", $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** DuckDB replay of [[hardNegativesTopK]]: unrolled k-means, the
    * probe, and the label-excluded cell-bounded top-k. */
  private def hardNegOracle(nprobe: Int, k: Int): String =
    s"""WITH e AS (
                SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm
                FROM embeddings),
              ${Similarity.kmeansOracleCtes(IvfNlist, IvfIters)},
              ${Similarity.ivfCentroidCtes(IvfIters)},
              q AS (
                SELECT vec_id AS query_id, label AS q_label, v AS qv, nrm AS qn
                FROM e WHERE vec_id < 20 AND nrm > 0),
              probe AS (
                SELECT query_id, q_label, qv, qn, c_label AS cell,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY list_dot_product(qv, cv) / (qn * cn) DESC,
                                  c_label ASC) AS rk
                FROM q CROSS JOIN fcn),
              p1 AS (SELECT query_id, q_label, qv, qn, cell
                     FROM probe WHERE rk <= $nprobe),
              sc AS (
                SELECT p.query_id, p.q_label, e.vec_id AS neighbor_id,
                       e.label AS n_label,
                       list_dot_product(p.qv, e.v) / (p.qn * e.nrm) AS cos,
                       row_number() OVER (PARTITION BY p.query_id
                         ORDER BY list_dot_product(p.qv, e.v) / (p.qn * e.nrm) DESC,
                                  e.vec_id ASC) AS rank
                FROM p1 p
                JOIN asn$IvfIters a ON a.cell = p.cell
                JOIN e ON e.vec_id = a.vec_id AND e.nrm > 0
                WHERE e.vec_id <> p.query_id AND e.label <> p.q_label)
              SELECT query_id, q_label, rank, neighbor_id, n_label, cos
              FROM sc WHERE rank <= $k ORDER BY query_id, rank"""

  val queries: Seq[QueryDef] = Seq(

    // Hard negatives at nprobe=4, top-5: the ANCE mining pass over the
    // trained IVF index with the label exclusion in the candidate
    // scan. MiningSpec pins label-correctness and equality with the
    // label-excluded brute force at nprobe = nlist.
    QueryDef(
      "s_hard_negatives",
      (s, d) => hardNegativesTopK(s, d, nprobe = 4, k = 5),
      Some(hardNegOracle(nprobe = 4, k = 5))),

    // The same mining pass from the DUMPED-AND-RELOADED labeled index
    // artifact — the deployment form of an alternating training loop's
    // mining job (train once, mine every epoch from the stored
    // artifact). Bit-identical to s_hard_negatives, so the oracle is
    // shared; MiningSpec pins the equality and the parquet-only
    // reloaded lineage.
    QueryDef(
      "s_hard_negatives_stored",
      (s, d) => hardNegativesStoredTopK(s, d, nprobe = 4, k = 5),
      Some(hardNegOracle(nprobe = 4, k = 5)))
  )
}
