package graft.streaming

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.{Checkpoints, Classify, TextAnalysis}

/** Arrival row for the online budget gate. */
case class MixArrival(doc_id: Long, source: String, nt: Long)

/** Per-domain budget-gate state: tokens seen so far (admitted or not —
  * the prefix-sum algebra of the batch form, where every prior doc in
  * the order contributes to `w_before`). */
case class BudgetCount(acc: Long)

/** Online budget admission output. */
case class BudgetAdmitted(
    doc_id: Long, source: String, nt: Long, w_before: Long,
    admitted: Boolean)

/** ONLINE mixture admission — the serving twins of `t_mix_rebalance`
  * and `t_mix_classified`, completing the mixing family's batch/online
  * symmetry (the w_dsir / w_select_* / w_classify_nb pattern): the
  * batch phase fixes the per-domain accept rates ONCE — exact-integer
  * ppm flattening every domain to the smallest domain's token budget —
  * and arrivals are then admitted by the portable hash against their
  * domain's frozen rate. Admission is a stateless per-row decision
  * (one broadcast rates join, the hash computed in-row), so
  * batch == stream by construction and an ingest path can thin a
  * stream to the target mixture without ever re-scanning the corpus.
  *
  * `w_mix_rebalance` keys the rate on the arrival's OWN source tag;
  * `w_mix_classified` composes two frozen artifacts — the NB
  * classifier assigns the arrival's PREDICTED domain, whose rate then
  * decides admission: the full online ingress of a tagged-mixture
  * pipeline (classify → thin), with no stage re-deriving anything.
  *
  * Serving semantics, deliberately: rates are frozen at build time, so
  * a drifting stream composition changes the ACHIEVED mixture until
  * rates are rebuilt (exactly how a deployment runs — rate rebuilds
  * are periodic batch jobs, not per-arrival bookkeeping). An arrival
  * whose domain key is ABSENT from the frozen rates frame (a source or
  * predicted class the rate build never saw) is DROPPED by the inner
  * rates join — the conservative default for a budgeted mixture (an
  * unbudgeted domain has no admission quota); a deployment that
  * prefers admit-unknown swaps the join to left-outer with a default
  * rate. The oracle replays rate building on the corpus and admission
  * for the replayed arrivals (the first 100 ids, as in the other
  * online twins — all in-corpus, so every replayed key is budgeted).
  */
object MixServe {

  /** ONLINE exact-budget admission — `t_mix_budget`'s stateful twin
    * (where the rate gates above are stateless): each domain carries
    * ONE persistent token counter (≤ |domains| longs of state total —
    * the [[Batching]] state-machine shape, RocksDB-backed in
    * deployment), and an arrival is admitted while its domain's
    * counter has not yet reached the frozen budget. The counter
    * accumulates EVERY arrival's tokens, admitted or not — exactly
    * the batch form's prefix-sum algebra (all prior docs in the order
    * contribute to `w_before`), so once a domain crosses its budget
    * it is closed for good, and the crossing arrival itself is
    * admitted (w_before < budget). Within a micro-batch arrivals sort
    * by doc_id for deterministic replay; across micro-batches the
    * counter continues. */
  def withOnlineBudget(
      docs: DataFrame, budget: Long): Dataset[BudgetAdmitted] = {
    import docs.sparkSession.implicits._
    require(budget > 0L, s"bad budget $budget")
    docs.as[MixArrival].groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[MixArrival], state: GroupState[BudgetCount]) =>
          var acc = state.getOption.map(_.acc).getOrElse(0L)
          val out = rows.toIndexedSeq.sortBy(_.doc_id).map { r =>
            val w = acc
            acc += r.nt
            BudgetAdmitted(r.doc_id, r.source, r.nt, w, w < budget)
          }
          state.update(BudgetCount(acc))
          out.iterator
      }
  }

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "w_mix_rebalance",
      (s, d) => {
        import s.implicits._
        // tokenize once: the totals pass and the arrival map share it
        val t = Checkpoints.lease("wmix_t", table(s, d, "documents")
          .select($"doc_id", $"source",
            size(TextAnalysis.tokens($"text")).cast("long").as("nt")))
        val tot = t.groupBy($"source")
          .agg(sum($"nt").as("ts"))
        val mn = tot.agg(min($"ts").as("mts"))
        val rates = tot.crossJoin(broadcast(mn))
          .withColumn("rate_ppm", expr("mts * 1000000L div ts"))
          .select($"source", $"rate_ppm")
        t.filter($"doc_id" < 100)
          .join(broadcast(rates), Seq("source"))
          .withColumn("admitted",
            graft.functions.PortableHash.md5Hash60($"doc_id".cast("string"))
              % 1000000L < $"rate_ppm")
          .select($"doc_id", $"source", $"nt", $"rate_ppm", $"admitted")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, source,
                       CAST(len([x for x in string_split_regex(lower(text), '\s+') if x != '']) AS BIGINT) AS nt
                FROM documents),
              tot AS (SELECT source, sum(nt) AS ts FROM t GROUP BY source),
              mn AS (SELECT min(ts) AS mts FROM tot),
              r AS (
                SELECT source, CAST((mts * 1000000) // ts AS BIGINT) AS rate_ppm
                FROM tot CROSS JOIN mn)
              SELECT t.doc_id, t.source, t.nt, r.rate_ppm,
                     (('0x' || substring(md5(CAST(t.doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000)
                       < r.rate_ppm AS admitted
              FROM t JOIN r USING (source)
              WHERE t.doc_id < 100 ORDER BY t.doc_id""")),

    // Online exact-budget admission under batch execution: the whole
    // corpus replayed as id-ordered arrivals through the per-domain
    // counters (see withOnlineBudget). The budget is the frozen batch
    // artifact (smallest domain's token total — t_mix_budget's); the
    // oracle replays the per-domain arrival-order prefix sums and the
    // admit-while-below rule with one per-source window.
    QueryDef(
      "w_mix_budget",
      (s, d) => {
        import s.implicits._
        val t = Checkpoints.lease("wmixb_t", table(s, d, "documents")
          .select($"doc_id", $"source",
            size(TextAnalysis.tokens($"text")).cast("long").as("nt")))
        val budget = t.groupBy($"source").agg(sum($"nt").as("ts"))
          .agg(min($"ts")).head().getLong(0)
        withOnlineBudget(t, budget)
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, source,
                       CAST(len([x for x in string_split_regex(lower(text), '\s+') if x != '']) AS BIGINT) AS nt
                FROM documents),
              mn AS (
                SELECT min(ts) AS budget
                FROM (SELECT source, sum(nt) AS ts FROM t GROUP BY source)),
              o AS (
                SELECT doc_id, source, nt,
                       CAST(coalesce(SUM(nt) OVER (PARTITION BY source
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS w_before
                FROM t)
              SELECT o.doc_id, o.source, o.nt, o.w_before,
                     o.w_before < mn.budget AS admitted
              FROM o CROSS JOIN mn ORDER BY o.doc_id""")),

    QueryDef(
      "w_mix_classified",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        // frozen artifact 1: the NB domain tagger
        val model = ClassifyServe.buildNbModel(
          docs, $"doc_id", $"text", $"lang")
        // frozen artifact 2: per-PREDICTED-domain accept rates, built
        // by classifying the corpus once with the same frozen model
        // (serve == batch prediction equality is the w_classify_nb
        // contract, so batch nbPredict would build identical rates)
        val pred = Checkpoints.lease("wmixc_pred",
          ClassifyServe.withOnlineNbPredict(docs, $"doc_id", $"text", model)
            .select($"doc_id", $"pred_lang"))
        val t = Checkpoints.lease("wmixc_t", docs
          .select($"doc_id",
            size(TextAnalysis.tokens($"text")).cast("long").as("nt"))
          .join(pred, Seq("doc_id")))
        val tot = t.groupBy($"pred_lang").agg(sum($"nt").as("ts"))
        val mn = tot.agg(min($"ts").as("mts"))
        val rates = tot.crossJoin(broadcast(mn))
          .withColumn("rate_ppm", expr("mts * 1000000L div ts"))
          .select($"pred_lang", $"rate_ppm")
        // arrivals: classify against the frozen model, admit against
        // the frozen predicted-domain rate — two broadcast artifacts,
        // zero corpus re-scans per arrival
        t.filter($"doc_id" < 100)
          .join(broadcast(rates), Seq("pred_lang"))
          .withColumn("admitted",
            graft.functions.PortableHash.md5Hash60($"doc_id".cast("string"))
              % 1000000L < $"rate_ppm")
          .select($"doc_id", $"pred_lang", $"nt", $"rate_ppm", $"admitted")
          .orderBy($"doc_id")
      },
      Some(s"""WITH ${Classify.nbCtes},
              mpred AS (SELECT doc_id, lab AS pred_lang FROM nbr WHERE rk = 1),
              mtt AS (
                SELECT d.doc_id, p.pred_lang,
                       CAST(len([x for x in string_split_regex(lower(d.text), '\\s+') if x != '']) AS BIGINT) AS nt
                FROM documents d JOIN mpred p USING (doc_id)),
              mtot AS (SELECT pred_lang, sum(nt) AS ts FROM mtt GROUP BY pred_lang),
              mmn AS (SELECT min(ts) AS mts FROM mtot),
              mr AS (
                SELECT pred_lang, CAST((mts * 1000000) // ts AS BIGINT) AS rate_ppm
                FROM mtot CROSS JOIN mmn)
              SELECT mtt.doc_id, mtt.pred_lang, mtt.nt, mr.rate_ppm,
                     (('0x' || substring(md5(CAST(mtt.doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000)
                       < mr.rate_ppm AS admitted
              FROM mtt JOIN mr USING (pred_lang)
              WHERE mtt.doc_id < 100 ORDER BY mtt.doc_id"""))
  )
}
