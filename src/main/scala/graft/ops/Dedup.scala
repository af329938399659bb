package graft.ops

import graft.QueryDef

/** Deduplication operators for a training-data pipeline over the
  * `documents` and `embeddings` tables: exact (hash-groupBy), n-gram
  * Jaccard (banded brute force), MinHash+LSH (shingle → minhash →
  * band → bucket-join), SimHash (hamming-banded), and embedding-cosine
  * near-dup.
  *
  * Scale design (100 TB):
  *   - exact dedup is one hash aggregation on a 128-bit content hash —
  *     the minimum possible shuffle (hash, not text, crosses the wire
  *     after map-side pre-aggregation of the keyed projection);
  *   - all near-dup variants avoid the O(n²) cross join: candidate
  *     pairs come from equi-joins on LSH bands / simhash chunks /
  *     content bands, so Spark plans ordinary shuffled hash joins whose
  *     cost is bounded by bucket occupancy, not corpus size;
  *   - signatures are fixed-width arrays computed in one codegen'd
  *     projection pass — no UDFs, no driver-side state.
  */
object Dedup
    extends DedupExactPart with DedupLshPart
    with DedupEmbedPart with DedupClusterPart {

  /** Every dedup query, in the registry order the driver has graded
    * since the families lived in one file — the per-family seqs are
    * spliced, not regrouped, so `Verify`/`Bench` enumerate exactly
    * the same sequence as before the split. */
  val queries: Seq[QueryDef] =
    exactQueries ++ lshQueries ++
      embedIncrementQueries ++ decontQueries ++ simhashQueries ++
      applyQueries ++ embedQueries ++ clusterQueries
}
