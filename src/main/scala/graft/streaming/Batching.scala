package graft.streaming

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arrival row for the online batcher (band precomputed in-row). */
case class BatchArrival(doc_id: Long, n_tokens: Long, len_band: Long)

/** Per-band batcher state: how many documents this band has ever
  * admitted (the next arrival's in-band sequence number). */
case class BatchCounter(n: Long)

/** Online batch assignment output. */
case class BatchAssigned(
    doc_id: Long, n_tokens: Long, len_band: Long, batch: Long)

/** ONLINE length-banded batch assignment — the serving-time twin of
  * [[graft.ops.Curate.lengthBatches]]: documents ARRIVE (a scored
  * stream leaving the curation pipeline) and each is assigned its
  * padding-minimizing (band, batch) slot immediately, from a persistent
  * per-band counter — batch k of a band closes the moment its
  * `batchSize`-th member arrives, so downstream training can consume
  * full batches with bounded padding without waiting for the corpus.
  *
  * Semantics vs the batch form: the batch operator orders bands by the
  * portable hash (an unbiased fixed permutation it can afford because
  * it sees the whole corpus); the online form necessarily assigns in
  * ARRIVAL order — the id-ordered replay below makes that order
  * deterministic and oracle-replayable (one per-band row_number over
  * doc_id).
  *
  * State/scale shape: state is ONE counter per band (≤ maxBand+1 longs
  * TOTAL — the cheapest state machine in the engine; RocksDB-backed in
  * deployment and restart-pinned in StreamIndexRocksDbSpec). The
  * trade-off is parallelism: sequential in-band sequence numbers are
  * inherently serial PER BAND, so arrivals shuffle to ≤ maxBand+1
  * groups and each band's micro-batch slice assigns on one core. That
  * is the cost of exact online numbering, not an accident — a
  * deployment needing more parallelism shards each band
  * (band × shard-of-hash keys) and accepts per-shard numbering. The
  * batch-replay `queries()` form runs each band as one group by
  * definition of batch execution, same as the other online twins. */
object Batching {

  /** Assign (len_band, batch) to every arrival, streaming or batch.
    * Within one micro-batch (or the whole input, in batch execution)
    * a band's arrivals are sorted by doc_id so replays are
    * deterministic; across micro-batches the persistent counter
    * continues where the last batch stopped. */
  def withOnlineBatches(
      docs: DataFrame, docId: Column, text: Column,
      bandWidth: Int = 64, maxBand: Int = 16,
      batchSize: Int = 32): Dataset[BatchAssigned] = {
    import docs.sparkSession.implicits._
    require(bandWidth > 0 && maxBand >= 0 && batchSize > 0,
      s"bad batching params ($bandWidth, $maxBand, $batchSize)")
    val in = docs.select(docId.as("doc_id"),
        size(graft.ops.TextAnalysis.tokens(text)).cast("long").as("n_tokens"))
      .withColumn("len_band",
        least(expr(s"n_tokens div $bandWidth"), lit(maxBand.toLong)))
      .as[BatchArrival]
    in.groupByKey(_.len_band)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BatchArrival], state: GroupState[BatchCounter]) =>
          var n = state.getOption.map(_.n).getOrElse(0L)
          val out = rows.toIndexedSeq.sortBy(_.doc_id).map { r =>
            val b = n / batchSize
            n += 1
            BatchAssigned(r.doc_id, r.n_tokens, r.len_band, b)
          }
          state.update(BatchCounter(n))
          out.iterator
      }
  }

  val queries: Seq[QueryDef] = Seq(

    // Online batching under batch execution: the whole corpus replayed
    // as id-ordered arrivals through the per-band counters. The oracle
    // replays the arrival-order numbering with one per-band window —
    // which also pins the typed counter state machine to the plain SQL
    // semantics bit-for-bit.
    QueryDef(
      "w_batch_bylen",
      (s, d) => {
        import s.implicits._
        withOnlineBatches(table(s, d, "documents"), $"doc_id", $"text")
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id,
                       CAST(len([x for x in string_split_regex(lower(text), '\s+') if x != '']) AS BIGINT) AS n_tokens
                FROM documents),
              b AS (
                SELECT doc_id, n_tokens,
                       CAST(least(n_tokens // 64, 16) AS BIGINT) AS len_band
                FROM t),
              r AS (
                SELECT doc_id, n_tokens, len_band,
                       row_number() OVER (PARTITION BY len_band ORDER BY doc_id) AS rib
                FROM b)
              SELECT doc_id, n_tokens, len_band,
                     CAST((rib - 1) // 32 AS BIGINT) AS batch
              FROM r ORDER BY doc_id"""))
  )
}
