package graft.streaming

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Pii, TextAnalysis}

/** The ONLINE corpus-cleaning pipeline — `pipe_corpus`'s streaming
  * twin: the stages an INGEST path can run as documents arrive, chained
  * as one transform that executes identically under batch and
  * Structured Streaming:
  *
  *   1. PII redaction        — t_pii_redact's regex chain (stateless);
  *   2. quality + repetition — t_quality_filter / t_rep_ngrams gates at
  *                             the pipe_corpus config (stateless);
  *   3. LM quality gate      — w_lm_score's broadcast frozen bigram
  *                             model, arrivals above [[LmGate]] mean
  *                             surprisal bits dropped (stateless map;
  *                             the threshold sits just under the
  *                             corpus's high tail, so both verdicts
  *                             occur — CCNet's drop-the-worst-tail
  *                             shape with a deterministic pin);
  *   4. dedup-keep-first     — the online LSH index
  *                             ([[NearDup.droppedByIndex]]): an arrival
  *                             that verifies against ANY earlier
  *                             arrival is dropped, first copy kept
  *                             (stateful — the only stateful stage).
  *
  * Stages 1-3 are per-row and keep the arrival's columns; stage 4 emits
  * dropped-id evidence, and survivors are `gated ANTI-JOIN dropped` —
  * executed inline here under batch, subtracted at the sink by a
  * streaming deployment (see [[NearDup.droppedByIndex]]).
  * StreamCorpusSpec replays arrivals through the SAME composed
  * transform in micro-batches and asserts the dropped set and the
  * surviving rows equal the batch form's.
  *
  * The stages deliberately exclude pipe_corpus's held-out split,
  * decontamination, and packing: those are CORPUS-relative (they need
  * the benchmark split or global offsets), while everything here is
  * decidable per arrival given the frozen artifacts — which is exactly
  * the batch/online split a production build runs.
  */
object StreamCorpus {

  /** Mean-surprisal gate (bits/token): sits at the corpus's p97 so
    * real documents fall on BOTH sides (the fixture corpus's clean
    * range is ~4.18-4.47; an all-pass or all-drop threshold would
    * leave the gate untested). */
  val LmGate = 4.45

  /** Stages 1-3: the stateless per-arrival transform (streaming-safe,
    * no shuffle, no state). */
  def gatedArrivals(docs: DataFrame, model: LmServe.LmModel): DataFrame = {
    import docs.sparkSession.implicits._
    val red = docs.withColumn("text",
      regexp_replace(
        regexp_replace(
          regexp_replace($"text", Pii.EmailRe, Pii.token("EMAIL")),
          Pii.IpRe, Pii.token("IP")),
        Pii.PhoneRe, Pii.token("PHONE")))
    val gated = TextAnalysis.withRepetitionStats(red, $"text")
      .withColumn("__toks", TextAnalysis.tokens($"text"))
      .withColumn("quality", TextAnalysis.qualityScoreOf($"text", $"__toks"))
      .filter($"dup_bigram_ratio" <= 0.1 && $"dup_trigram_ratio" <= 0.02 &&
        $"quality" >= 0.6 && $"n_tokens" >= 30L)
      .select($"doc_id", $"lang", $"text",
        $"n_tokens".as("n_ws_tokens"), $"quality")
    LmServe.withLmScoreColumn(gated, $"text", model)
      .filter($"avg_bits" <= LmGate)
  }

  val queries: Seq[QueryDef] = Seq(

    // The online pipeline under batch execution. The oracle replays
    // redaction + gates (the pipe_corpus fragments), LM training on
    // the RAW corpus with OOV-total scoring (LEFT joins — redaction
    // mints tokens the model never saw), and keep-first dedup as
    // "dropped = later element of any verified pair" over the gated
    // survivors.
    QueryDef(
      "w_corpus",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val model = LmServe.buildLmModel(docs, $"text")
        // the gated relation fans out three ways under batch (the
        // index heap-guard action, the band explode, the anti-join
        // left side) — lease it so redaction + gates + the LM map run
        // once (streaming has no such fan-out: the state op is the
        // only consumer, so gatedArrivals itself stays lease-free)
        val gated = graft.ops.Checkpoints.lease("w_corpus_gated",
          gatedArrivals(docs, model))
        val dropped = NearDup
          .droppedByIndex(gated, $"doc_id", $"text", 0.5)
          .toDF().distinct()
        gated.join(dropped, Seq("doc_id"), "left_anti")
          .select($"doc_id", $"lang", $"n_ws_tokens", $"quality", $"avg_bits")
          .orderBy($"doc_id")
      },
      Some {
        val toksExpr =
          """[x for x in string_split_regex(lower(text), '\s+') if x != '']"""
        s"""WITH red AS (
              SELECT doc_id, lang,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text, '${Pii.EmailRe}', '<EMAIL>', 'g'),
                         '${Pii.IpRe}', '<IP>', 'g'),
                       '${Pii.PhoneRe}', '<PHONE>', 'g') AS text
              FROM documents),
            ct AS (SELECT doc_id, lang, text, $toksExpr AS toks FROM red),
            gates AS (
              SELECT doc_id, lang, text, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
                     least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
                       + (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text)) * 0.3
                       + least(CAST(len([x for x in toks if list_contains(['the','and','of','to','in','is','that','it','was','for'], x)]) AS DOUBLE)
                               / CAST(greatest(len(toks), 1) AS DOUBLE) * 4.0, 1.0) * 0.3 AS quality,
                     CAST(greatest(len(toks) - 1, 0)
                          - CASE WHEN len(toks) >= 2
                              THEN len(list_distinct([array_to_string(toks[i:i+1], ' ')
                                                      for i in range(1, len(toks))]))
                              ELSE 0 END AS DOUBLE)
                       / greatest(len(toks) - 1, 1) AS dup_bigram_ratio,
                     CAST(greatest(len(toks) - 2, 0)
                          - CASE WHEN len(toks) >= 3
                              THEN len(list_distinct([array_to_string(toks[i:i+2], ' ')
                                                      for i in range(1, len(toks) - 1)]))
                              ELSE 0 END AS DOUBLE)
                       / greatest(len(toks) - 2, 1) AS dup_trigram_ratio
              FROM ct),
            cl AS (
              SELECT doc_id, lang, text, toks, n_tokens AS n_ws_tokens, quality
              FROM gates
              WHERE dup_bigram_ratio <= 0.1 AND dup_trigram_ratio <= 0.02
                AND quality >= 0.6 AND n_tokens >= 30),
            ${graft.ops.LmScore.lmAgainstCtes("l_", "cl", "documents")},
            lmg AS (
              SELECT cl.doc_id, cl.lang, cl.text, cl.n_ws_tokens, cl.quality,
                     l_lm.avg_bits
              FROM cl JOIN l_lm USING (doc_id) WHERE l_lm.avg_bits <= $LmGate),
            ${Dedup.minhashSideCtes("o_", "lmg")},
            ocand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                      FROM o_bands a JOIN o_bands b
                        ON a.band = b.band AND a.doc_id < b.doc_id),
            dropped AS (
              SELECT DISTINCT c.id_b AS doc_id
              FROM ocand c
              JOIN o_xb xa ON xa.doc_id = c.id_a
              JOIN o_xb xb2 ON xb2.doc_id = c.id_b
              WHERE CAST(len(list_intersect(xa.xs, xb2.xs)) AS DOUBLE)
                    / (len(xa.xs) + len(xb2.xs) - len(list_intersect(xa.xs, xb2.xs))) >= 0.5)
            SELECT doc_id, lang, n_ws_tokens, quality, avg_bits
            FROM lmg WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
            ORDER BY doc_id"""
      })
  )
}
