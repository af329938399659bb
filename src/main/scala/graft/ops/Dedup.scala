package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
object Dedup {

  import TextAnalysis.tokens

  /** Word n-gram shingle set over an ALREADY-BOUND token-array column.
    * `toks` must be a real column attribute, not an expression tree:
    * lambda bodies re-evaluate captured outer EXPRESSIONS per element
    * (no CSE across higher-order functions), so passing `tokens(text)`
    * here would re-run the tokenizer once per shingle — the difference
    * between O(tokens) and O(tokens²) per document. Use
    * [[withWordShingles]] / [[withHashedShingles]] for the safe
    * DataFrame-level form. */
  def wordShinglesOf(toks: Column, n: Int = 3): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>")))

  /** Word n-gram shingle set of a text column (scalar convenience for
    * tiny inputs/specs — see [[wordShinglesOf]] for why the bulk path
    * must bind the token array first). */
  def wordShingles(text: Column, n: Int = 3): Column =
    wordShinglesOf(tokens(text), n)

  /** Adds `out` = distinct word n-gram shingles of `text` via the
    * FUSED native expression (graft.functions.WordShingles): one
    * compiled tokenize+shingle+distinct pass per document, replacing
    * the four-deep interpreted HOF tree that was the dedup family's
    * largest shared cost. Bit-identical to [[wordShinglesOf]] over
    * [[tokens]] (asserted in DedupSpec). */
  def withWordShingles(df: DataFrame, text: Column, out: String, n: Int = 3): DataFrame =
    df.withColumn(out, graft.functions.TextShingles.wordShingles(text, n))

  /** Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 64-bit SimHash of a token multiset — per-bit majority vote of
    * token hashes — represented as 4 x 16-bit chunk values (an
    * array<int>). The chunk representation is both ANSI-overflow-safe
    * and exactly what hamming-LSH banding buckets on. Chunk c covers
    * signature bits [16c, 16c+16), most-significant bit first inside
    * the chunk. */
  def simhashChunks(toks: Column): Column = {
    // votes[i] = sum over tokens of (+1 if bit i of xxhash64(token), else -1)
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", xxhash64(t), i).bitwiseAND(lit(1L)) === lit(1L), lit(1))
            .otherwise(lit(-1))),
        (a, v) => a + v))
    transform(sequence(lit(0), lit(3)), c =>
      aggregate(
        slice(votes, c * lit(16) + lit(1), lit(16)),
        lit(0),
        (acc, v) => acc * lit(2) + when(v > 0, lit(1)).otherwise(lit(0))))
  }

  /** Hamming distance between two chunked signatures. Unrolled over
    * the fixed 4-chunk layout with element_at/bit_count builtins: the
    * HOF form (`aggregate(zip_with(...))`) is CodegenFallback and ran
    * INTERPRETED per candidate pair in the simhash verify projection
    * — the one per-pair expression in that hot path. Same int sum,
    * bit-exact. */
  def hammingChunks(a: Column, b: Column, chunks: Int = 4): Column =
    (0 until chunks)
      .map(i => bit_count(element_at(a, i + 1).bitwiseXOR(element_at(b, i + 1))).cast("int"))
      .reduce(_ + _)

  /** Columnar SimHash: same signature as [[simhashChunks]] (asserted
    * equivalent in DedupSpec) computed from exploded (id, token) rows,
    * via ONE native aggregate ([[graft.functions.SimHashSigAgg]]): the
    * ones-count vector lives in the aggregation buffer, partials merge
    * with a vector add, and the majority-vote chunks come out of
    * eval() directly. The hash is bound to a real column first so the
    * aggregate's child is an attribute, not the md5 pipeline. Int
    * counters are exact to 2^31 tokens per doc (the earlier
    * packed-long form overflowed at 2^14 and needed a guard). Docs
    * with zero tokens produce no row (vs an all-zero signature from
    * the scalar form). */
  def simhashChunksAgg(
      tokRows: DataFrame, id: Column, tok: Column,
      hash: Column => Column = c => xxhash64(c),
      bits: Int = 64): DataFrame =
    tokRows.select(id.as("id"), hash(tok).as("__h"))
      .groupBy(col("id"))
      .agg(graft.functions.SimHashAgg.simhashSig(col("__h"), bits).as("sig"))

  /** [[simhashChunksAgg]] from (doc) rows directly, hashing each
    * DISTINCT token once and count-weighting the vote: the fused
    * WordTokenCounts expression collapses the token multiset to
    * (token, count) entries inside the row (before the explode), so
    * the md5/xxhash pipeline runs per distinct token per doc — ~5-10x
    * fewer hash evaluations on natural text — while the weighted
    * vote keeps signatures bit-identical to the per-occurrence form
    * (DedupSpec asserts it). Same one-aggregation plan shape: explode
    * -> hash projection -> ObjectHashAggregate with map-side partials.
    * Docs with zero tokens produce no row (empty array explodes to
    * nothing), matching [[simhashChunksAgg]] over exploded tokens. */
  def simhashChunksAggCounted(
      docs: DataFrame, id: Column, text: Column,
      hash: Column => Column = c => xxhash64(c),
      bits: Int = 64): DataFrame =
    docs.select(id.as("id"),
        explode(graft.functions.TextShingles.wordTokenCounts(text)).as("tc"))
      .select(col("id"), hash(col("tc.tok")).as("__h"), col("tc.cnt").as("__c"))
      .groupBy(col("id"))
      .agg(graft.functions.SimHashAgg.simhashSigWeighted(
        col("__h"), col("__c"), bits).as("sig"))

  /** Exact dedup: group by a content hash, keep the lowest id.
    * Returns (hash, keeper id, group size). */
  def exactGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(lower(text)).as("content_hash"))
      .agg(min(id).as("keeper"), count(lit(1)).as("n_docs"))

  /** Cross-document duplicated n-gram spans — the distributed
    * approximation of exact-substring training-data dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * ACL'22, which builds a suffix array; the MapReduce-shaped
    * equivalent is exactly this n-gram multiset pass): a word n-gram
    * occurring in >= 2 documents marks a memorized/boilerplate span.
    * Returns one row per document: its distinct n-gram count, how many
    * of those n-grams also occur in at least one OTHER document, and
    * the duplicated fraction (the "how much of this doc is copied"
    * signal a pipeline thresholds on).
    *
    * Scale shape: the distinct n-gram set is computed IN-ROW by the
    * fused WordShingles expression (no explode-then-dedupe shuffle);
    * postings then shuffle ONCE on a 60-bit portable gram hash (8-byte
    * keys, partial-count map-side combine — never the gram strings),
    * the duplicated-gram side is filtered to nd >= 2 BEFORE the
    * back-join, and the per-doc rollup is a second count aggregate.
    * Nothing is ever pairwise: cost is bounded by total posting count,
    * not doc². A viral gram (site boilerplate shared by millions of
    * docs) makes one hot reducer key in the back-join — the standard
    * AQE skew-join split handles it, and the count aggregate itself is
    * immune (map-side partials). Distinct-per-doc grams mean count(*)
    * per hash IS the document frequency. The same md5-derived hash is
    * replayed by the DuckDB oracle, so hash collisions (~(#grams)²/2^61)
    * cannot cause a compare mismatch — both engines see them. */
  def dupNgramStats(docs: DataFrame, id: Column, text: Column, n: Int = 8): DataFrame = {
    val g = docs.select(id.as("doc_id"),
      graft.functions.TextShingles.wordShingles(text, n).as("grams"))
    val x = g.select(col("doc_id"), explode(col("grams")).as("__gram"))
      .select(col("doc_id"),
        graft.functions.PortableHash.md5Hash60(col("__gram")).as("h"))
    val dup = x.groupBy(col("h")).agg(count(lit(1)).as("nd")).filter(col("nd") >= 2)
    val perDoc = x.join(dup, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("__nd"))
    g.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("__nd"), lit(0L)).as("n_dup_grams"),
        (coalesce(col("__nd"), lit(0L)).cast("double") /
          greatest(col("n_grams"), lit(1L)).cast("double")).as("dup_ratio"))
  }

  /** Longest verbatim duplicated run per document — the positional
    * refinement of [[dupNgramStats]] and the signal the
    * exact-substring dedup literature actually thresholds on ("drop
    * documents sharing a >= 50-token verbatim span"): a distinct
    * n-gram COUNT cannot distinguish fifty scattered boilerplate
    * grams from one fifty-gram copied paragraph, while the longest
    * consecutive run of cross-document-duplicated gram POSITIONS is
    * exactly the length of the longest copied span (r consecutive
    * duplicated grams cover r + n - 1 tokens).
    *
    * Scale shape, per stage: every stage derives from ONE tokenizing
    * pass — the fused [[graft.functions.PositionalGramHashes]] array:
    * (1) duplicated-gram set = per-doc DISTINCT hashes
    * (`array_distinct` in-row — so two distinct grams colliding into
    * one 60-bit hash count as one posting per doc, exactly mirroring
    * the oracle's `SELECT DISTINCT doc_id, h`; hashing gram STRINGS
    * first and deduping those would diverge on that astronomically
    * rare collision), one 8-byte-hash shuffle, map-side combine;
    * (2) positional grams = per-row fan-out of the same array — the
    * explode emits 8-byte hashes directly, so the token array never
    * leaves the row it was parsed in (the slice-per-position column
    * form would carry the whole array through the generator,
    * amplifying per-row bytes by the position count); (3) flagged
    * positions = equi-join on the gram hash (pair-bound: output <=
    * positional postings); (4) runs = the classic islands-and-gaps
    * trick, pos - row_number() constant within a consecutive run —
    * ONE window keyed by doc (a doc's positions fit a partition by
    * construction: documents are bounded, corpora are not) and two
    * count aggregates. Nothing global, nothing pairwise. The oracle
    * replays every stage including the hash; n_gram_pos is
    * size(positional array) — by construction max(m - n + 1, 0). */
  def dupNgramSpans(docs: DataFrame, id: Column, text: Column, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ph = docs.select(id.as("doc_id"),
      graft.functions.TextShingles.positionalGramHashes(text, n).as("__ph"))
    val positional = ph
      .select(col("doc_id"),
        posexplode(col("__ph")).as(Seq("__pos0", "h")))
      .select(col("doc_id"), (col("__pos0") + 1L).as("pos"), col("h"))
    val dup = ph
      .select(col("doc_id"), explode(array_distinct(col("__ph"))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val wRn = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = positional.join(dup, Seq("h"))
      .withColumn("island", col("pos") - row_number().over(wRn))
      .groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("run_len"))
    val perDoc = runs.groupBy(col("doc_id")).agg(
      sum(col("run_len")).as("__ndp"), max(col("run_len")).as("__lr"))
    ph.select(col("doc_id"), size(col("__ph")).cast("long").as("n_gram_pos"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_gram_pos"),
        coalesce(col("__ndp"), lit(0L)).as("n_dup_pos"),
        when(col("__lr").isNull, lit(0L))
          .otherwise(col("__lr") + (n - 1)).as("longest_dup_tokens"))
  }

  /** Exact-substring dedup APPLIED — the transform the duplicated-span
    * literature actually ships (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better": excise every duplicated
    * >= n-token span, keeping one occurrence): a token position is
    * removed when it is covered by a duplicated n-gram occurrence
    * that is not that gram's globally-first (canonical) occurrence.
    * Canonical = min (doc_id, pos) lexicographically — deterministic,
    * partitioning-independent, and identical in the oracle (struct
    * min is field-lexicographic in both engines). Within-document
    * repeats count: a doc that repeats its own 8-gram keeps only the
    * first copy. Output pins the surviving text by md5 of the
    * rejoined kept tokens (the `t_chunk` convention) plus kept /
    * removed counts.
    *
    * Scale shape: one tokenize pass computes both the token array and
    * the fused positional gram hashes, leased once and fanned out to
    * the occurrence explode and the reconstruction join. Occurrence
    * counting + canonical selection is ONE hash-keyed aggregate with
    * map-side combine (min(struct) partials — a window per gram hash
    * would serialize viral grams; the agg does not). Flagged
    * occurrences move by gram-hash equi-join (fan-out = occurrence
    * count, linear), collapse to one `qs` row per doc (bounded:
    * documents are bounded, corpora are not), and the per-row
    * interval-coverage filter runs in-row over (token, qs) — the HOF
    * lambda is interpreted, but it executes once per surviving row,
    * not per fan-out, and never shuffles. */
  /** The shared excision core: (doc_id, toks, __kept) where `__kept`
    * is the surviving (token, position) struct array. `tag` names the
    * tokenize-pass lease so the standalone query and pipeline stages
    * hold independent checkpoints. */
  private def spanKept(
      docs: DataFrame, id: Column, text: Column, n: Int, tag: String): DataFrame = {
    val base = Checkpoints.lease(tag, docs.select(
      id.as("doc_id"),
      graft.functions.TextShingles.wordTokens(text).as("toks"),
      graft.functions.TextShingles.positionalGramHashes(text, n).as("__ph")))
    val occ = base
      .select(col("doc_id"), posexplode(col("__ph")).as(Seq("__p0", "h")))
      .select(col("doc_id"), (col("__p0") + lit(1L)).as("q"), col("h"))
    val dup = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("__no"),
        min(struct(col("doc_id"), col("q"))).as("__canon"))
      .filter(col("__no") >= 2)
      .select(col("h"),
        col("__canon").getField("doc_id").as("c_doc"),
        col("__canon").getField("q").as("c_q"))
    val flagged = occ.join(dup, Seq("h"))
      .filter(!(col("doc_id") === col("c_doc") && col("q") === col("c_q")))
      .groupBy(col("doc_id")).agg(collect_list(col("q")).as("qs"))
    base.join(flagged, Seq("doc_id"), "left")
      .withColumn("qs", coalesce(col("qs"), array().cast("array<bigint>")))
      .withColumn("__kept", filter(
        transform(col("toks"), (t, i0) =>
          struct(t.as("t"), (i0 + 1).cast("long").as("p"))),
        s => !exists(col("qs"), q =>
          q <= s.getField("p") && s.getField("p") <= q + lit((n - 1).toLong))))
      .select(col("doc_id"), col("toks"), col("__kept"))
  }

  def applySpanDedup(docs: DataFrame, id: Column, text: Column, n: Int = 8): DataFrame =
    spanKept(docs, id, text, n, "dd_apply_spans")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("__kept"))).cast("long").as("n_removed"),
        md5(concat_ws(" ",
          transform(col("__kept"), s => s.getField("t")))).as("kept_md5"))

  /** [[applySpanDedup]] as a PIPELINE stage: (doc_id, text, n_excised)
    * where `text` is the surviving tokens rejoined with single spaces
    * (lowercased, whitespace-normalized — the exact stream every
    * downstream tokenizer derives anyway, so feeding it forward is
    * value-identical). */
  def withSpanExcision(
      docs: DataFrame, id: Column, text: Column,
      n: Int = 8, tag: String = "dd_apply_spans"): DataFrame =
    spanKept(docs, id, text, n, tag)
      .select(col("doc_id"),
        concat_ws(" ", transform(col("__kept"), s => s.getField("t"))).as("text"),
        (size(col("toks")) - size(col("__kept"))).cast("long").as("n_excised"))

  /** DuckDB replay of [[spanKept]] rooted at `docsRel` (which must
    * expose (doc_id, text)) at the n = 8 gram width BOTH call sites
    * use (the SQL pins toks[i:i+7] / q+7 literally — a caller passing
    * a different n to the Spark side must regenerate, not reuse,
    * this fragment): CTEs `{p}t`/`{p}p`/`{p}d`/`{p}f` and
    * `{p}x` = (doc_id, n_tokens, n_removed, kept_text) — kept_text is
    * the rejoined surviving tokens, coalesced to '' (DuckDB's
    * array_to_string of an empty list is NULL). Shared by the
    * standalone `dd_apply_spans` oracle and the `pipe_corpus`
    * composition so both replay the SAME excision. */
  private[graft] def spanExcisionCtes(p: String, docsRel: String): String =
    s"""${p}t AS (
          SELECT doc_id,
                 [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
          FROM $docsRel),
        ${p}p AS (
          SELECT doc_id, u.g['pos'] AS q,
                 ('0x' || substring(md5(u.g['gram']), 1, 15))::BIGINT AS h
          FROM (
            SELECT doc_id,
                   unnest([{'pos': i, 'gram': array_to_string(toks[i:i+7], ' ')}
                           for i in range(1, len(toks) - 6)]) AS g
            FROM ${p}t WHERE len(toks) >= 8) u),
        ${p}d AS (
          SELECT h, min({'d': doc_id, 'q': q}) AS canon
          FROM ${p}p GROUP BY h HAVING count(*) >= 2),
        ${p}f AS (
          SELECT p.doc_id, list(p.q) AS qs
          FROM ${p}p p JOIN ${p}d d USING (h)
          WHERE NOT (p.doc_id = d.canon['d'] AND p.q = d.canon['q'])
          GROUP BY p.doc_id),
        ${p}x AS (
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
                 coalesce(array_to_string(kept, ' '), '') AS kept_text
          FROM (
            SELECT t.doc_id, len(t.toks) AS n_tokens,
                   [t.toks[pp] for pp in range(1, len(t.toks) + 1)
                    if len([q for q in coalesce(f.qs, []) if q <= pp and pp <= q + 7]) = 0] AS kept
            FROM ${p}t t LEFT JOIN ${p}f f USING (doc_id)))"""

  /** EXACT containment-similarity pairs — the asymmetric near-dup
    * case Jaccard structurally misses: a short document fully quoted
    * inside a long one has J = |A|/|B| (small for |B| >> |A|) but
    * containment C(A,B) = |G_A ∩ G_B| / |G_A| = 1. Returns every
    * DIRECTIONAL pair (a, b) with C(a,b) >= tn/td over distinct
    * 3-gram hash sets, with the exact intersection and both set
    * sizes — the "find quoted/subsumed documents" pass a dedup
    * pipeline runs beside its symmetric Jaccard pass.
    *
    * Candidate generation is the containment prefix filter (the
    * asymmetric sibling of the Bayardo WWW'07 prefix this file's
    * [[prefixCandidates]] uses): order grams globally by (df ASC,
    * hash ASC); if C(a,b) >= t then b must contain one of a's first
    * `|G_a| - ceil(t*|G_a|) + 1` grams (if it missed ALL of them, the
    * shared set would fit in a's suffix: |A∩B| <= ceil(t*|G_a|) - 1 <
    * t*|G_a|) — so the join is a's PREFIX postings against the FULL
    * index, complete by construction. Because the indexed side posts
    * everything, the PPJoin positional filter degenerates (any shared
    * prefix gram IS a collision), so pruning rests on (1) df-ascending
    * prefixes — a viral gram has maximal df, sorts to every suffix,
    * and never generates candidates; (2) the containment length
    * filter n_b * td >= n_a * tn (|A∩B| <= min(n_a, n_b)). Verify is
    * the codegen'd two-pointer merge over one sorted in-row gram
    * array per doc ([[graft.functions.SortedLongIntersectCount]]) —
    * candidate pairs move as two narrow id equi-joins, never a
    * per-gram row explosion. The uh30 gram hashes replay in the
    * oracle, which checks the NAIVE all-pairs containment over the
    * same hash sets — a stronger check than mirroring the prefix
    * pipeline, since completeness itself is what it exercises. */
  def containmentPairs(
      docs: DataFrame, tn: Int = 9, td: Int = 10,
      minGrams: Int = 5): DataFrame = {
    val withSets = docs
      .withColumn("hs",
        graft.functions.TextShingles.hashedWordShingles(col("text"), 3, "uh30"))
      .select(col("doc_id"), col("hs"), size(col("hs")).as("n"))
      .filter(col("n") >= minGrams)
    val posts = withSets
      .select(col("doc_id"), col("n"), explode(col("hs")).as("x"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("x").asc)
    val ranked = posts
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("x"))))
      .withColumn("rk", row_number().over(wDoc))
    // contained-side prefix length n - ceil(t*n) + 1, exact integers
    val pref = ranked.filter(col("rk") <=
      col("n") - floor((col("n") * tn + lit(td - 1)) / lit(td)) + 1)
    val cand = pref.as("a")
      .join(ranked.as("b"),
        col("a.x") === col("b.x") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.n") * td >= col("a.n") * tn)
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("__c"))
      .select(col("id_a"), col("id_b"))
    val arrays = withSets.select(col("doc_id"),
      sort_array(col("hs")).as("xs"), col("n"))
    val inter = graft.functions.TextShingles
      .sortedLongIntersectCount(col("xsa"), col("xsb"))
    cand
      .join(arrays.select(col("doc_id").as("id_a"),
        col("xs").as("xsa"), col("n").as("n_a")), Seq("id_a"))
      .join(arrays.select(col("doc_id").as("id_b"),
        col("xs").as("xsb"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("inter", inter.cast("long"))
      .filter(col("inter") * td >= col("n_a") * tn)
      .select(col("id_a"), col("id_b"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        col("inter"),
        (col("inter").cast("double") / col("n_a").cast("double")).as("containment"))
  }

  /** Prefix-filtered candidate pairs for EXACT Jaccard >= tn/td over
    * hashed shingle sets (Bayardo et al., WWW'07): each doc indexes
    * only the first |x| - ceil(t*|x|) + 1 grams of its set in the
    * global (df ASC, hash ASC) order — complete for J >= t (any pair
    * reaching t must collide inside both prefixes), while stop-grams
    * sort to the suffix and never generate candidates. Input must
    * carry (doc_id, text) — plus an integer `band` column when
    * `banded` (length-band blocking: side a replicates each prefix
    * posting under band keys {band-1, band, band+1}, so the non-equi
    * adjacency predicate |band_a - band_b| <= 1 becomes part of the
    * equi-join key). Returns (posts = (doc_id [, band], n, x) distinct
    * gram-hash postings for the count-based verify join, cand =
    * distinct (id_a, id_b) candidate pairs).
    *
    * The distinct hashed gram set is computed IN-ROW by the fused
    * HashedWordShingles expression (tokenize, shingle, hash, dedupe in
    * one compiled pass) — the former explode + collect_set + re-explode
    * dedupe shuffled every posting through an ObjectHashAggregate
    * before any pairing work started. Every consumer of `posts` shares
    * that one pass, and the df-window exchange below is the lineage
    * point ReuseExchange serves all of them from (PlanSpec pins it). */
  def prefixCandidates(
      docs: DataFrame, tn: Int = 1, td: Int = 2,
      hashKind: String = "uh30",
      banded: Boolean = false): (DataFrame, DataFrame) = {
    val bandCols = if (banded) Seq(col("band")) else Seq.empty[Column]
    val posts = docs
      .withColumn("hs",
        graft.functions.TextShingles.hashedWordShingles(col("text"), 3, hashKind))
      .select((col("doc_id") +: bandCols) ++
        Seq(size(col("hs")).as("n"), explode(col("hs")).as("x")): _*)
    // df as a count window over partition(x), not a groupBy+self-join:
    // one exchange feeds the window directly, two fewer stages (a
    // groupBy+join form was measured 20% slower at sf0.1 even with the
    // df table broadcast — the extra pass over posts costs more than
    // the window's sort)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("x").asc)
    // prefix length n - ceil(t*n) + 1 in exact integer math:
    // ceil(tn*n/td) = (tn*n + td - 1) div td  (n, tn, td > 0)
    val pref = posts
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("x"))))
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <=
        col("n") - floor((col("n") * tn + lit(td - 1)) / lit(td)) + 1)
      .select((col("doc_id") +: bandCols) ++
        Seq(col("n"), col("x"), col("rk")): _*)
    // Two further EXACT prunes inside/after the join, both from the
    // PPJoin family (Xiao et al., WWW'08):
    //  - length filter: J <= min/max, so J >= tn/td needs
    //    td*min >= tn*max;
    //  - positional filter: let g* be the max-ordered prefix collision
    //    of a pair, at ranks (rka, rkb). Any OTHER shared gram sorting
    //    before g* would lie inside both prefixes (ranks are monotone
    //    in the global (df, x) order) and so would itself be a
    //    collision — hence every non-collision shared gram sorts after
    //    g*, giving inter <= c + min(n_a - rka, n_b - rkb). J >= tn/td
    //    needs (td+tn)*inter >= tn*(n_a + n_b), so pairs failing that
    //    bound at the inter upper estimate can never verify. This is
    //    what keeps the verify join (candidates x grams) pair-bound,
    //    not collision-bound.
    // The max-rank row is the same row for both sides (rank order is
    // the shared global gram order), so two max() aggregates agree.
    val prefA =
      if (banded)
        pref.withColumn("bkey",
          explode(array(col("band") - 1, col("band"), col("band") + 1)))
      else pref
    val bandAdj =
      if (banded) col("a.bkey") === col("b.band") else lit(true)
    val cand = prefA.as("a")
      .join(pref.as("b"),
        col("a.x") === col("b.x") && bandAdj && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * td >= col("b.n") * tn && col("b.n") * td >= col("a.n") * tn)
      .groupBy(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("c"),
        max(col("a.rk")).as("rka"), max(col("b.rk")).as("rkb"))
      .filter(lit(td + tn) * (col("c") +
        least(col("na") - col("rka"), col("nb") - col("rkb"))) >=
        lit(tn) * (col("na") + col("nb")))
      .select(col("id_a"), col("id_b"))
    (posts, cand)
  }

  /** Exact-content collapse + pair-expand combinator — the machinery
    * shared by every near-dup PAIR query (formerly hand-inlined per
    * query). Groups `df` by `groupCols`, runs the pairwise machinery
    * (`repPairs`) on one representative per group (the minimal
    * `idCol`), then expands verified rep pairs back to member pairs
    * and adds within-group member pairs valued/gated by `withinVals`.
    *
    * Correctness contract (each caller's pairwise machinery must
    * satisfy it; the per-query comments state why):
    *   - group members are indistinguishable to `repPairs` — identical
    *     `groupCols` implies identical signatures/bands/similarity, so
    *     a rep pair reproduces every cross-group pair's value exactly;
    *   - `withinVals(reps)` returns one row (`__min`, value columns)
    *     per group whose members pair with each other at that value —
    *     groups absent from it (ineligible: no tokens/shingles, or a
    *     self-similarity below threshold) produce no within pairs.
    *
    * `repPairs(reps)` must return (`id_a`, `id_b`, value columns) with
    * id_a < id_b drawn from rep ids; the expansion re-orders member
    * ids via least/greatest. Output is ordered (id_a, id_b).
    *
    * Scale: the pairwise stage costs O(distinct group keys), not
    * O(rows) — on a duplicate-saturated 100 TB corpus this is the
    * difference between bounded candidate joins and a quadratic blowup
    * in the true-duplicate cliques (ScaleSpec exercises saturation).
    */
  def collapseExpandPairs(
      df: DataFrame, idCol: String, groupCols: Seq[Column])(
      repPairs: DataFrame => DataFrame)(
      withinVals: DataFrame => DataFrame): DataFrame = {
    val grp = df.withColumn("__min",
      min(col(idCol)).over(Window.partitionBy(groupCols: _*)))
    val reps = grp.filter(col(idCol) === col("__min"))
    val upairs = repPairs(reps)
    val valueCols = upairs.columns.filterNot(c => c == "id_a" || c == "id_b").toSeq
    val members = grp.select(col(idCol), col("__min"))
    val cross = upairs
      .join(members.select(col(idCol).as("ma"), col("__min").as("id_a")), Seq("id_a"))
      .join(members.select(col(idCol).as("mb"), col("__min").as("id_b")), Seq("id_b"))
      .select(least(col("ma"), col("mb")).as("id_a") +:
        greatest(col("ma"), col("mb")).as("id_b") +: valueCols.map(col): _*)
    val within = members.as("x")
      .join(members.as("y"),
        col("x.__min") === col("y.__min") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col("x.__min").as("__min"),
        col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .join(withinVals(reps), Seq("__min"))
      .select(col("id_a") +: col("id_b") +: valueCols.map(col): _*)
    cross.unionByName(within).orderBy(col("id_a"), col("id_b"))
  }

  /** Connected components of an undirected pair graph as min-label
    * propagation: every vertex starts labeled with its own id and
    * repeatedly takes the minimum label over itself and its neighbors
    * until a fixpoint — the final label is the minimum vertex id of
    * the component (the canonical-document id a dedup pipeline keys
    * clusters on). Returns (id, cluster).
    *
    * Execution shape: the DRIVER runs the loop, but it is control
    * only — each round is one distributed join + hash aggregate, data
    * never leaves executors, and convergence is detected from a
    * 1-row aggregate (labels only ever decrease, so sum(label) is
    * strictly monotone until the fixpoint — no per-row diff join).
    * Round count is the component diameter, which for near-dup
    * clusters is small (dup cliques have diameter 1; chains of
    * borderline pairs are short); `maxIters` fails loudly rather than
    * returning a half-propagated labeling. Each round's labels are
    * eagerly `localCheckpoint`ed and the previous round's blocks
    * dropped: checkpointing (unlike persist) also TRUNCATES the
    * logical plan, which otherwise deepens by one join per round and
    * sends Catalyst re-optimizing — and eventually OOMing the driver
    * on — an ever-growing tree (observed at ~20 rounds; any iterative
    * DataFrame algorithm needs this). At 100 TB the same loop holds
    * (rounds are
    * diameter-bounded, not data-bounded); a graph with adversarially
    * long chains would swap this for the two-phase star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — same per-round plan shape. */
  /** Shared localCheckpoint lease machinery ([[Checkpoints]]) under
    * the "cc" tag: each CC invocation releases the PRIOR invocation's
    * result blocks, checkpoints per round (truncating the per-round
    * plan growth), and registers its own result blocks for the next
    * entry. See [[Checkpoints]] for the full lifetime contract.
    */
  private def checkpointedWithRdd(
      df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) =
    Checkpoints.checkpointedWithRdd(df)

  private def ccReleasePrior(sc: org.apache.spark.SparkContext): Unit =
    Checkpoints.releasePrior("cc", sc)

  private def ccRegister(sc: org.apache.spark.SparkContext)(
      finals: org.apache.spark.rdd.RDD[_]*): Unit =
    Checkpoints.register("cc", sc)(finals: _*)

  /** Min-label-propagation connected components (see the execution
    * notes above). RESULT LIFETIME CONTRACT: the returned frame is
    * backed by localCheckpoint blocks that are released at the NEXT
    * [[connectedMinLabels]]/[[connectedStarContraction]] call on the
    * same SparkContext — consume the result (write/collect/derive)
    * before re-invoking CC on that context, and do not run two CC
    * computations concurrently on one session. */
  def connectedMinLabels(
      vertices: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    ccReleasePrior(vertices.sparkSession.sparkContext)
    val e = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var (labels, labelsRdd) =
      checkpointedWithRdd(vertices.select(col("id"), col("id").as("label")))
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var sum0 = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val prop = e.join(labels, e("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nlabel"))
      val (next, nextRdd) = checkpointedWithRdd(labels.as("l")
        .join(prop, col("l.id") === prop("dst"), "left")
        .select(col("l.id").as("id"),
          least(col("l.label"), coalesce(col("nlabel"), col("l.label"))).as("label")))
      val sum1 = labelSum(next)
      labelsRdd.unpersist(blocking = false) // previous round's checkpoint blocks
      labels = next
      labelsRdd = nextRdd
      converged = sum1.compareTo(sum0) == 0
      sum0 = sum1
      iter += 1
    }
    e.unpersist()
    // register BEFORE the convergence require: a non-convergent run's
    // last checkpoint must also be reclaimed at the next CC entry
    ccRegister(vertices.sparkSession.sparkContext)(labelsRdd)
    require(converged, s"component labeling did not converge in $maxIters rounds")
    labels
  }

  /** Connected components by alternating star contraction (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14,
    * alg. 2 "two-phase") — the documented fallback
    * [[connectedMinLabels]] names for graphs with adversarially long
    * chains. Same signature, same output contract: (id, label) with
    * label = the component's minimum vertex id.
    *
    * Each round rewires edges toward local minima:
    *  - LARGE-STAR: for every vertex c, link each strictly-larger
    *    neighbor to min(N(c) ∪ {c});
    *  - SMALL-STAR: for every vertex u over its smaller-or-equal
    *    neighborhood N(u), link u and each x ∈ N(u) to min(N(u)).
    * Both keep every edge inside one equi-join + hash-aggregate round
    * (same per-round plan shape as min-label propagation), but the
    * component shrinks to a star rooted at its minimum in O(log n)
    * rounds instead of O(diameter) — a 10⁶-long chain needs ~20 rounds,
    * not 10⁶. Near-dup cliques (diameter 1-2) don't need this; use it
    * when the pair graph's shape is unknown or chain-heavy.
    *
    * Convergence = the canonical (hi, lo) edge set reaches a fixpoint,
    * detected from a 1-ROW SET FINGERPRINT per round — (count,
    * bit_xor of xxhash64(u, v)) over the distinct canonical edges: one
    * cheap aggregate job, where the round-5 version paid a full
    * count() PLUS a shuffle-compare exceptAll every round (two extra
    * distributed jobs — it was the slowest bench entry). bit_xor is
    * order-independent and overflow-free (sum would throw under ANSI),
    * and over a DISTINCT edge set it is a proper set fingerprint. The
    * moment the fingerprint repeats, the fixpoint is asserted EXACTLY
    * once (one-way except — both sides distinct, counts already
    * equal), so the output contract stays bit-exact; a 64-bit
    * collision would fail loudly, never return a wrong labeling. At
    * the fixpoint the edges form a star forest (child → component-min
    * root); vertices with no edge label themselves.
    *
    * RESULT LIFETIME CONTRACT: same as [[connectedMinLabels]] — the
    * returned frame's checkpoint blocks are released at the next CC
    * call on the same SparkContext; consume before re-invoking, and
    * do not run two CC computations concurrently on one session. */
  def connectedStarContraction(
      vertices: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    ccReleasePrior(vertices.sparkSession.sparkContext)
    def canon(e: DataFrame): DataFrame =
      e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // localCheckpoint (not persist) per round: truncates the logical
    // plan so Catalyst never re-optimizes the accumulated join tree —
    // see connectedMinLabels' doc
    var (e, eRdd) =
      checkpointedWithRdd(canon(edges.select(col("id_a").as("u"), col("id_b").as("v"))))
    var eFp = fingerprint(e)
    var converged = eFp._1 == 0L
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star around every center c (both edge directions)
      val sym = e.select(col("u").as("c"), col("v").as("n"))
        .unionByName(e.select(col("v").as("c"), col("u").as("n")))
      val cmin = sym.groupBy("c").agg(min(col("n")).as("nm"))
        .select(col("c"), least(col("c"), col("nm")).as("m"))
      val large = canon(sym.join(cmin, "c").filter(col("n") > col("c"))
        .select(col("n").as("u"), col("m").as("v"))).persist()
      // small-star over each u's (strictly smaller, post-canon) nbrs
      val umin = large.groupBy("u").agg(min(col("v")).as("m"))
      val withM = large.join(umin, "u")
      val (next, nextRdd) = checkpointedWithRdd(canon(
        withM.select(col("v").as("u"), col("m").as("v"))
          .unionByName(withM.select(col("u"), col("m").as("v")))))
      val nFp = fingerprint(next)
      if (nFp == eFp) {
        // the once-at-exit exact assert (see doc): counts are equal, so
        // an empty one-way difference proves set equality
        require(next.exceptAll(e).isEmpty,
          "star contraction: edge sets differ at equal fingerprint (64-bit collision)")
        converged = true
      }
      large.unpersist()
      eRdd.unpersist(blocking = false) // previous round's checkpoint blocks
      e = next
      eRdd = nextRdd
      eFp = nFp
      iter += 1
    }
    // e stays checkpointed: the returned frame reads it, and a
    // localCheckpoint's blocks are NOT recomputable once dropped —
    // released at the NEXT CC entry (see ccLiveBlocks). Registered
    // before the require so a non-convergent run is reclaimed too.
    ccRegister(vertices.sparkSession.sparkContext)(eRdd)
    require(converged, s"star contraction did not converge in $maxIters rounds")
    vertices.select(col("id"))
      .join(e.select(col("u").as("id"), col("v").as("__root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__root"), col("id")).as("label"))
  }

  /** Exact-content collapse for APPLIED dedup (survivor set): groups
    * `docs` by `groupCols`, lets `dominatedReps` name dominated
    * representatives from the eligible-rep set, marks every non-rep
    * member of an ELIGIBLE group as twin-dominated by its group
    * minimum, and anti-joins. Same collapse proof as
    * [[collapseExpandPairs]]: a non-rep x of an eligible group is
    * dominated by its group min at similarity 1; a rep x is dominated
    * iff some group Y with sim(Y, X) >= t has min(Y) < x — exactly a
    * rep pair. Group members are content-homogeneous, so member
    * eligibility equals rep eligibility and eligibility is computed
    * once per distinct content, not per doc. Returns the surviving
    * rows of `docs` (original schema). */
  def collapseApplySurvivors(
      docs: DataFrame, idCol: String, groupCols: Seq[Column])(
      eligibleReps: DataFrame => DataFrame)(
      dominatedReps: DataFrame => DataFrame): DataFrame = {
    val grp = docs.withColumn("__min",
      min(col(idCol)).over(Window.partitionBy(groupCols: _*)))
    val reps = grp.filter(col(idCol) === col("__min"))
    val el = eligibleReps(reps)
    val twinDominated = grp.filter(col(idCol) =!= col("__min"))
      .join(el.select(col(idCol).as("__min")), Seq("__min"))
      .select(col(idCol))
    val dominated = dominatedReps(el).toDF(idCol).unionByName(twinDominated)
    docs.join(dominated, Seq(idCol), "left_anti")
  }

  /** The dd_apply_lsh pipeline as a reusable stage over ANY doc set
    * carrying `doc_id` + `text` (original schema preserved): applied
    * minhash-LSH dedup at t = 0.5 through the exact-content collapse.
    * collapseApplySurvivors' contract holds exactly as in
    * dd_minhash_lsh: identical texts share signatures, bands, AND
    * exact hash-set Jaccard, so the rep pair reproduces every
    * cross-group domination and the group minimum dominates its
    * eligible twins directly (shingles computed once per unique
    * content). Shingle-less reps emit no postings/bands and can never
    * pair, so running the pipeline on eligible reps only is
    * output-identical. */
  def applyLshSurvivors(docs: DataFrame): DataFrame =
    collapseApplySurvivors(docs, "doc_id", Seq(md5(lower(col("text"))))) { reps =>
      reps.filter(size(graft.functions.TextShingles.wordShingles(col("text"), 3)) > 0)
    } { el =>
      minhashNearDups(
          el.select(col("doc_id"), col("text")), col("doc_id"), col("text"), 0.5)
        .select(col("id_b").as("doc_id")).distinct()
    }

  /** Incremental minhash-LSH dedup — the dedup family's `add()` path,
    * the batch twin of the ONLINE keep-first index
    * ([[graft.streaming.NearDup]] / `w_dedup_first`) and the dedup
    * mirror of `s_ann_ivf_add`: a continuously-ingesting 100 TB
    * corpus does NOT re-pair itself per arriving batch. The corpus
    * keeps its minhash signatures + band postings as a FROZEN index
    * (leased here; a stored table at a deployment), and an arriving
    * batch is admitted by (1) banding the BATCH only, (2) joining
    * batch bands against corpus bands — the corpus always wins, id
    * order irrelevant — and (3) joining batch bands against
    * themselves under keep-first id order. Candidate volume is
    * batch-sized on one side of every join; corpus×corpus pairing
    * never happens (that cost was paid once, by `dd_apply_lsh`, when
    * the corpus was built).
    *
    * Semantics mirror the streaming index with arrival order =
    * (corpus, then batch by id): a batch doc is dominated iff some
    * corpus doc, or some earlier batch doc, verifies at
    * jaccard >= `threshold`. Gramless docs (under 3 tokens) emit no
    * signature and always survive — the same eligibility rule every
    * minhash operator here applies. Returns the surviving batch rows
    * (original schema). */
  def lshIncrementSurvivors(
      base: DataFrame, batch: DataFrame, threshold: Double = 0.5,
      h: Int = 32, b: Int = 16): DataFrame = {
    // the frozen corpus index (signatures + xs sets): band postings
    // and the verify stage both read it — leased, never rebuilt per
    // consumer.
    val sigO = Checkpoints.lease("lshinc_base",
      minhashSignatures(base, col("doc_id"), col("text"), h))
    lshIncrementFromIndex(sigO,
      sigO.select(col("id"), explode(array(minhashBandKeys(h, b): _*)).as("band")),
      batch, threshold, h, b)
  }

  /** [[lshIncrementSurvivors]]'s admission core against a PRE-BUILT
    * frozen corpus index: `sigO` is the signature frame
    * ([[minhashSignatures]]'s (id, xs, __sig) — leased in-session, or
    * reloaded from [[IndexStore]] parquet), `bandsO` its exploded
    * (id, band) postings. The batch side leases for its own two
    * consumers; the corpus side is read as given — for a reloaded
    * index that is a plain parquet FileScan, no lease and no lineage
    * back to the corpus text. */
  def lshIncrementFromIndex(
      sigO: DataFrame, bandsO: DataFrame, batch: DataFrame,
      threshold: Double = 0.5, h: Int = 32, b: Int = 16): DataFrame = {
    val sigN = Checkpoints.lease("lshinc_batch",
      minhashSignatures(batch, col("doc_id"), col("text"), h))
    val bandsN = sigN.select(col("id"),
      explode(array(minhashBandKeys(h, b): _*)).as("band"))
    val candCorpus = bandsN.as("a")
      .join(bandsO.as("o"), col("a.band") === col("o.band"))
      .select(col("a.id").as("id_n"), col("o.id").as("id_o")).distinct()
    val candBatch = bandsN.as("a")
      .join(bandsN.as("p"), col("a.band") === col("p.band") && col("p.id") < col("a.id"))
      .select(col("a.id").as("id_n"), col("p.id").as("id_o")).distinct()
    def verified(cand: DataFrame, sigOther: DataFrame) = cand
      .join(sigN.select(col("id").as("id_n"), col("xs").as("xs_n")), Seq("id_n"))
      .join(sigOther.select(col("id").as("id_o"), col("xs").as("xs_o")), Seq("id_o"))
      .filter(jaccard(col("xs_n"), col("xs_o")) >= threshold)
      .select(col("id_n"))
    val dominated = verified(candCorpus, sigO)
      .unionByName(verified(candBatch, sigN))
      .distinct().toDF("doc_id")
    batch.join(dominated, Seq("doc_id"), "left_anti")
  }

  private val lshStoreSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The durable round-trip for the dedup corpus index — the LSH twin
    * of `s_ann_ivf_stored`'s cycle: build the corpus signature frame
    * ONCE (the text is scanned exactly once — the band postings are
    * derived from the STORED signatures, not recomputed), SAVE both
    * frames as parquet artifacts, RELOAD them, and admit the batch
    * against the reloaded index. Values are bit-identical to
    * [[lshIncrementSurvivors]] (parquet round-trips the
    * long/long-array schema exactly; IndexStoreSpec pins
    * admission-decision equality in a fresh session), so the same
    * oracle covers both. The reloaded corpus lineage is a plain
    * parquet FileScan — a deployment's day-2 admission job needs zero
    * knowledge of how the index was built. */
  def lshStoredSurvivors(
      base: DataFrame, batch: DataFrame, threshold: Double = 0.5,
      h: Int = 32, b: Int = 16): DataFrame = {
    val s = batch.sparkSession
    val root = IndexStore.scratchRoot(s, "lshstore", lshStoreSeq.incrementAndGet())
    IndexStore.save(root,
      "lsh_sigs" -> minhashSignatures(base, col("doc_id"), col("text"), h))
    val sigStored = IndexStore.load(s, root, "lsh_sigs")
    IndexStore.save(root, "lsh_bands" -> sigStored.select(col("id"),
      explode(array(minhashBandKeys(h, b): _*)).as("band")))
    lshIncrementFromIndex(
      IndexStore.load(s, root, "lsh_sigs"),
      IndexStore.load(s, root, "lsh_bands"),
      batch, threshold, h, b)
  }

  /** TAKEDOWN + admit: the stored corpus index is compacted by a
    * document tombstone set (one `IndexStore.compact` anti-join
    * rewrite of the signature frame; the band postings REBUILD from
    * the compacted primary, so no stale posting can resurrect a
    * forgotten document), then the batch is admitted against the
    * compacted index. Values equal admitting against the corpus minus
    * the tombstoned documents — `dd_lsh_takedown` pins that under the
    * increment oracle with the corpus relation filtered. */
  def lshTakedownSurvivors(
      base: DataFrame, batch: DataFrame, tombstones: DataFrame,
      threshold: Double = 0.5, h: Int = 32, b: Int = 16): DataFrame = {
    val s = batch.sparkSession
    val root = IndexStore.scratchRoot(s, "lshtakedown", lshStoreSeq.incrementAndGet())
    IndexStore.save(root,
      "lsh_sigs" -> minhashSignatures(base, col("doc_id"), col("text"), h))
    IndexStore.compact(s, root, "lsh_sigs", tombstones, idCol = "id")
    val sigStored = IndexStore.load(s, root, "lsh_sigs")
    IndexStore.save(root, "lsh_bands" -> sigStored.select(col("id"),
      explode(array(minhashBandKeys(h, b): _*)).as("band")))
    lshIncrementFromIndex(
      IndexStore.load(s, root, "lsh_sigs"),
      IndexStore.load(s, root, "lsh_bands"),
      batch, threshold, h, b)
  }

  /** Incremental EMBEDDING dedup — the vector twin of
    * [[lshIncrementSurvivors]], completing the incremental-admission
    * closure across both near-dup families: the corpus keeps its
    * double vectors + hyperplane band buckets as a FROZEN leased
    * index, and an arriving batch is admitted by bucketing the BATCH
    * only — batch buckets join corpus buckets (the corpus always
    * wins) and themselves under keep-first id order, with the exact
    * dot-product cosine verifying candidates at >= `threshold`.
    * Zero-norm vectors emit no postings (cosine would be 0/0 = NaN)
    * and always survive, the family's explicit gate. Candidate
    * volume is batch-sized on one side of every join; corpus×corpus
    * pairing never recurs. Returns the surviving batch rows
    * (original schema). */
  /** The family's prepped-vector frame: double vectors with norms,
    * zero-norm rows dropped (cosine would be 0/0 = NaN — the explicit
    * gate every embedding operator applies). */
  private def prepVecs(df: DataFrame): DataFrame = df
    .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    .withColumn("norm", Similarity.l2norm(col("v")))
    .filter(col("norm") > 0)

  /** Hyperplane band-bucket postings of a prepped frame (the family's
    * shared LSH: bands=8, r=8, probed dimension). */
  private def vecBuckets(sig: DataFrame): DataFrame = sig.select(col("vec_id"),
    explode(Similarity.bandBucketsProbed(sig, col("v"), bands = 8, r = 8)).as("bkt"))

  def embedIncrementSurvivors(
      base: DataFrame, batch: DataFrame, threshold: Double = 0.4): DataFrame = {
    val sigO = Checkpoints.lease("embinc_base", prepVecs(base))
    embedIncrementFromIndex(sigO, vecBuckets(sigO), batch, threshold)
  }

  private val embStoreSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The durable round-trip for the VECTOR corpus index — the
    * embedding twin of [[lshStoredSurvivors]]: prep the corpus
    * vectors ONCE (the bucket postings derive from the STORED frame,
    * so the embeddings scan once), SAVE both frames as parquet
    * artifacts, RELOAD them, and admit the batch against the reloaded
    * index. Values are bit-identical to [[embedIncrementSurvivors]]
    * (parquet round-trips the long/double-array schema exactly;
    * IndexStoreSpec pins admission-decision equality in a fresh
    * session), so the same oracle covers both. */
  def embedStoredSurvivors(
      base: DataFrame, batch: DataFrame, threshold: Double = 0.4): DataFrame = {
    val s = batch.sparkSession
    val root = IndexStore.scratchRoot(s, "embstore", embStoreSeq.incrementAndGet())
    IndexStore.save(root, "vec_sigs" -> prepVecs(base))
    val sigStored = IndexStore.load(s, root, "vec_sigs")
    IndexStore.save(root, "vec_buckets" -> vecBuckets(sigStored))
    embedIncrementFromIndex(
      IndexStore.load(s, root, "vec_sigs"),
      IndexStore.load(s, root, "vec_buckets"),
      batch, threshold)
  }

  /** TAKEDOWN + admit for the VECTOR corpus index — the embedding
    * twin of [[lshTakedownSurvivors]]: compact the stored vector
    * frame by the tombstone set, rebuild bucket postings from the
    * compacted primary, admit the batch. Values equal admitting
    * against the corpus minus the tombstoned vectors
    * (`dd_embed_takedown`'s filtered-corpus oracle). */
  def embedTakedownSurvivors(
      base: DataFrame, batch: DataFrame, tombstones: DataFrame,
      threshold: Double = 0.4): DataFrame = {
    val s = batch.sparkSession
    val root = IndexStore.scratchRoot(s, "embtakedown", embStoreSeq.incrementAndGet())
    IndexStore.save(root, "vec_sigs" -> prepVecs(base))
    IndexStore.compact(s, root, "vec_sigs", tombstones)
    val sigStored = IndexStore.load(s, root, "vec_sigs")
    IndexStore.save(root, "vec_buckets" -> vecBuckets(sigStored))
    embedIncrementFromIndex(
      IndexStore.load(s, root, "vec_sigs"),
      IndexStore.load(s, root, "vec_buckets"),
      batch, threshold)
  }

  /** [[embedIncrementSurvivors]]'s admission core against a PRE-BUILT
    * frozen vector index: `sigO` is the prepped corpus frame
    * (vec_id, v, norm — leased in-session, or reloaded from
    * [[IndexStore]] parquet), `bandsO` its bucket postings. */
  def embedIncrementFromIndex(
      sigO: DataFrame, bandsO: DataFrame, batch: DataFrame,
      threshold: Double = 0.4): DataFrame = {
    val sigN = Checkpoints.lease("embinc_batch", prepVecs(batch))
    val bandsN = vecBuckets(sigN)
    val candCorpus = bandsN.as("a")
      .join(bandsO.as("o"), col("a.bkt") === col("o.bkt"))
      .select(col("a.vec_id").as("id_n"), col("o.vec_id").as("id_o")).distinct()
    val candBatch = bandsN.as("a")
      .join(bandsN.as("p"),
        col("a.bkt") === col("p.bkt") && col("p.vec_id") < col("a.vec_id"))
      .select(col("a.vec_id").as("id_n"), col("p.vec_id").as("id_o")).distinct()
    def verified(cand: DataFrame, sigOther: DataFrame) = cand
      .join(sigN.select(col("vec_id").as("id_n"), col("v").as("vn"),
        col("norm").as("nn")), Seq("id_n"))
      .join(sigOther.select(col("vec_id").as("id_o"), col("v").as("vo"),
        col("norm").as("no")), Seq("id_o"))
      .filter(Similarity.dot(col("vn"), col("vo")) / (col("nn") * col("no")) >= threshold)
      .select(col("id_n"))
    val dominated = verified(candCorpus, sigO)
      .unionByName(verified(candBatch, sigN))
      .distinct().toDF("vec_id")
    batch.join(dominated, Seq("vec_id"), "left_anti")
  }

  /** MinHash+LSH near-dup pairs, columnar form: shingles exploded to
    * (id, gram-hash) postings; the h-wide signature is h `min`
    * aggregates over permuted hashes (one hash-aggregate pass, no
    * array churn); bands of r signature slots hash to bucket keys; the
    * bucket equi-join yields candidates; exact Jaccard over the
    * distinct 30-bit gram-hash sets verifies. Output (id_a, id_b,
    * sim), id_a < id_b, one row per pair.
    *
    * The verify stage joins the gram-hash SETS carried on the
    * signature rows (collect_list alongside the min aggregates, one
    * extra array column through the one aggregation that already
    * exists) — rejoining freshly-derived shingle arrays would
    * re-tokenize the whole corpus two more times at 100 TB, and a
    * per-gram postings join would shuffle |candidates| x |grams| rows.
    * Jaccard over distinct hash sets equals gram Jaccard up to 30-bit
    * in-document collisions (~n²/2³¹ per doc — negligible), and BOTH
    * engines compute the hash-set form, so the oracle parity is exact
    * even when a collision occurs.
    *
    * The hash family is [[graft.functions.PortableHash]]'s universal
    * hashing over a 30-bit md5-prefix base (one md5 per posting, h
    * integer permutations) so the ENTIRE pipeline — signatures,
    * banding, candidates, verify — replays in the DuckDB oracle (see
    * the dd_minhash_lsh oracle SQL); a deployment preferring xxhash64
    * swaps the two hash call sites. */
  /** The in-row signature stage shared by the symmetric and asymmetric
    * minhash operators: (id, xs = deduped 30-bit gram-hash set,
    * __sig = h-slot signature), gramless docs dropped. */
  private[graft] def minhashSignatures(
      docs: DataFrame, id: Column, text: Column, h: Int,
      keep: Seq[Column] = Nil): DataFrame =
    docs
      .select(id.as("id") +:
        graft.functions.TextShingles.hashedWordShingles(text, 3, "uh30").as("xs") +:
        keep: _*)
      .filter(size(col("xs")) > 0)
      .withColumn("__sig", graft.functions.MinhashSlots.minhashSlots(col("xs"), h))

  /** Band bucket keys over a `__sig` column: b keys of r slots each. */
  private[graft] def minhashBandKeys(h: Int, b: Int): Seq[Column] = {
    val r = h / b
    (0 until b).map { i =>
      md5(concat_ws(",", lit(i.toString) +:
        (0 until r).map(j => element_at(col("__sig"), r * i + j + 1)): _*))
    }
  }

  def minhashNearDups(
      docs: DataFrame, id: Column, text: Column,
      threshold: Double, h: Int = 32, b: Int = 16): DataFrame = {
    // The whole signature stage is IN-ROW: HashedWordShingles emits
    // the deduped 30-bit gram-hash set per doc (one compiled pass) and
    // MinhashSlots folds the h universal-hash minima over it — where
    // the former pipeline exploded postings and shuffled them into a
    // groupBy of h min-aggregates + collect_set, the signature now
    // needs NO exchange at all. Hash-set dedupe before the mins keeps
    // a 30-bit in-document collision from double-counting in the
    // verify stage, exactly like the collect_set form. Gramless docs
    // are filtered here (they produced no aggregate row before, and
    // can never become candidates either way).
    val sigs = minhashSignatures(docs, id, text, h)
    val bands = sigs.select(col("id"),
      explode(array(minhashBandKeys(h, b): _*)).as("band"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col("id").as("id_a"), col("xs").as("xs_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("xs").as("xs_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("xs_a"), col("xs_b")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Decontamination — asymmetric near-dup scrub: remove from `docs`
    * every document whose minhash-verified similarity to ANY document
    * of `blocklist` reaches `threshold`. The pretraining-data step
    * that keeps benchmark/eval text out of a training corpus; unlike
    * [[minhashNearDups]] nothing in `docs` is compared to itself, and
    * the blocklist is read-only.
    *
    * Scale shape: both sides run the IN-ROW signature stage (zero
    * exchanges); candidates are an equi-join of the two band sets with
    * the blocklist side BROADCAST — benchmarks are thousands of
    * documents while the corpus is the 100 TB side, so the corpus
    * streams through map-side joins and only its contaminated ids ever
    * shuffle (for the distinct + anti-join). Verification is exact
    * hash-set jaccard on candidate pairs only, against the same
    * portable hash family, so the whole pipeline replays in DuckDB.
    *
    * The broadcast is GUARDED, not assumed: the blocklist's dominant
    * broadcast payload is its distinct gram-hash sets (`xs` —
    * proportional to total blocklist TEXT, not document count), and a
    * caller feeding a corpus-sized "blocklist" would otherwise die on
    * Spark's 8 GB broadcast ceiling / driver heap at exactly the scale
    * this operator advertises. One blocklist-side aggregate (cheap by
    * the small-side contract; the corpus side is untouched) measures
    * the payload; past `broadcastMaxGrams` (default 32M grams ≈ 256 MB
    * of longs — comfortably inside executor and driver budgets) the
    * hints are dropped and the join strategy is left to Catalyst +
    * AQE, which re-plans from RUNTIME sizes: correct at any blocklist
    * scale, merely slower than the map-side fast path.
    * Returns the surviving rows of `docs` (original schema). */
  def decontaminate(
      docs: DataFrame, blocklist: DataFrame, idCol: String, text: Column,
      threshold: Double, h: Int = 32, b: Int = 16,
      broadcastMaxGrams: Long = 32L << 20): DataFrame = {
    val ds = minhashSignatures(docs, col(idCol), text, h)
    val bs = minhashSignatures(blocklist, col(idCol), text, h)
    val blockGrams = bs.agg(coalesce(sum(size(col("xs"))), lit(0L)))
      .head().getLong(0)
    val hint: DataFrame => DataFrame =
      if (blockGrams <= broadcastMaxGrams) broadcast else identity
    val dBands = ds.select(col("id"),
      explode(array(minhashBandKeys(h, b): _*)).as("band"))
    val bBands = bs.select(col("id").as("bid"),
      explode(array(minhashBandKeys(h, b): _*)).as("band"))
    val cand = dBands.join(hint(bBands), Seq("band"))
      .select(col("id"), col("bid")).distinct()
    val contaminated = cand
      .join(ds.select(col("id"), col("xs")), Seq("id"))
      .join(hint(bs.select(col("id").as("bid"), col("xs").as("xs_b"))), Seq("bid"))
      .filter(jaccard(col("xs"), col("xs_b")) >= threshold)
      .select(col("id").as(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** The embeddings table prepared for the embedding near-dup family:
    * doubles, precomputed norm, and the grouping-safe exact-equality
    * key. The group key is a codegen'd BINARY fingerprint of the
    * vector, NOT the raw array<float>: keying on the float array makes
    * NormalizeFloatingNumbers wrap it in an interpreted transform(...)
    * that the window sort then evaluates per comparison
    * (FloatVectorBytes doc has the full autopsy); bytes-equal <=>
    * float-equal under grouping semantics, so the groups — and the
    * oracle, which partitions by embedding — are unchanged. */
  private def embedAll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    table(s, d, "embeddings")
      .select($"vec_id", $"embedding", Similarity.asDouble($"embedding").as("v"))
      .withColumn("norm", Similarity.l2norm($"v"))
      .withColumn("vkey",
        graft.functions.VectorExpressions.floatVectorBytes($"embedding"))
  }

  /** Verified cosine pairs over exact-vector group REPRESENTATIVES:
    * banded hyperplane-LSH candidates + exact dot-product verify —
    * the pairwise stage shared by dd_embed_cos (which expands the
    * pairs back to members) and dd_embed_cluster (which runs
    * connected components over them). */
  private def embedRepPairs(reps0: DataFrame): DataFrame = {
    // norm > 0 is load-bearing, not an optimization: a zero-norm
    // vector's cosine is 0/0 = NaN, and BOTH engines evaluate
    // NaN >= 0.4 as TRUE (Spark's nan-safe ordering and DuckDB each
    // place NaN above every value) — without the explicit gate,
    // zero-norm reps would sail through the verify filter and pair
    val reps = reps0.filter(col("norm") > 0)
      .select(col("vec_id"), col("v"), col("norm"))
    // empty-safe dim probe (LIMIT-1 scan) so the 64 plane
    // evaluations compile to constant-vector DotProducts instead
    // of interpreted HOFs — the corpus dimension is fixed per
    // table; a mismatched row fails loudly instead of silently
    // dropping from candidate generation
    val banded = reps.select(col("vec_id"),
      explode(Similarity.bandBucketsProbed(reps, col("v"), bands = 8, r = 8)).as("bkt"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    cand
      .join(reps.select(col("vec_id").as("id_a"), col("v").as("v_a"), col("norm").as("n_a")), Seq("id_a"))
      .join(reps.select(col("vec_id").as("id_b"), col("v").as("v_b"), col("norm").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))).as("cos"))
      .filter(col("cos") >= 0.4)
  }

  /** Reps whose self-cosine reaches the threshold — the eligibility
    * gate for within-group pairing (a zero-norm vector never pairs,
    * not even with its exact twins: cosine is undefined for it).
    * The norm > 0 conjunct enforces that: self-cosine of a zero-norm
    * vector is 0/0 = NaN, which Spark's NaN-high ordering would pass
    * through `>= 0.4` (the oracle's selfcos CTE carries the matching
    * `nrm > 0`). */
  private def embedEligibleReps(reps: DataFrame): DataFrame =
    reps.filter(col("norm") > 0 &&
      (Similarity.dot(col("v"), col("v")) / (col("norm") * col("norm"))) >= 0.4)

  /** Full (vec_id, cluster) membership over the verified embedding
    * near-dup graph — the shared core of dd_embed_cluster (which emits
    * it directly) and dd_embed_apply (which keeps one representative
    * per cluster). Components run on exact-vector reps, members
    * inherit, zero-norm vectors are singletons; cluster id is the
    * component-minimum vec_id across ALL members (the rep minimum,
    * and reps are their groups' minima). */
  private def embedMembership(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grp = embedAll(s, d).withColumn("__min",
      min($"vec_id").over(Window.partitionBy($"vkey")))
    val reps = grp.filter($"vec_id" === $"__min")
    val pairs = embedRepPairs(reps).select($"id_a", $"id_b")
    val repLabels = connectedMinLabels(reps.select($"vec_id".as("id")), pairs)
    val eligible = embedEligibleReps(reps).select($"vec_id".as("__min"))
    val members = grp.select($"vec_id", $"__min")
    val inherited = members.join(eligible, Seq("__min"))
      .join(repLabels.select($"id".as("__min"), $"label".as("cluster")), Seq("__min"))
      .select($"vec_id", $"cluster")
    val singletons = members.join(eligible, Seq("__min"), "left_anti")
      .select($"vec_id", $"vec_id".as("cluster"))
    inherited.unionByName(singletons)
  }

  /** Embedding-space decontamination — asymmetric near-dup scrub over
    * vectors: remove from `docs` every row whose embedding's cosine to
    * ANY `blocklist` vector reaches `threshold`. The semantic twin of
    * [[decontaminate]] for leakage that survives paraphrase: n-gram
    * minhash needs shared text, the embedding form only a nearby
    * vector. Both sides carry (idCol, v, norm, vkey) as [[embedAll]]
    * produces them; returns the surviving `docs` rows (input schema
    * minus nothing — `__min` is internal).
    *
    * Scale shape mirrors the text form: each side collapses to
    * exact-vector group REPRESENTATIVES first (twins share every band
    * bucket and every cosine, so a member is contaminated iff its rep
    * is); candidates are the family's shared hyperplane band equi-join
    * (bands=8, r=8) with the blocklist side BROADCAST under the same
    * guarded-hint discipline as the text form (one bounded
    * blocklist-side aggregate measures the payload in vector doubles;
    * past the cap the hints drop and Catalyst + AQE plan from runtime
    * sizes); verification is the exact dot-product cosine on candidate
    * pairs only. Zero-norm vectors never pair — cosine is 0/0 = NaN
    * and BOTH engines evaluate NaN >= t as true, so the norm > 0 gates
    * here (and the `nrm > 0` conjuncts in the oracle) are load-bearing:
    * zero-norm rows always survive, on both engines, explicitly. */
  def embedDecontaminate(
      docs: DataFrame, blocklist: DataFrame, idCol: String,
      threshold: Double,
      broadcastMaxDoubles: Long = 8L << 20): DataFrame = {
    val grp = docs.withColumn("__min",
      min(col(idCol)).over(Window.partitionBy(col("vkey"))))
    val reps = grp.filter(col(idCol) === col("__min") && col("norm") > 0)
      .select(col(idCol).as("__tid"), col("v"), col("norm"))
    val breps = blocklist
      .withColumn("__bmin", min(col(idCol)).over(Window.partitionBy(col("vkey"))))
      .filter(col(idCol) === col("__bmin") && col("norm") > 0)
      .select(col(idCol).as("__bid"), col("v").as("bv"), col("norm").as("bn"))
    val blockDoubles = breps.agg(coalesce(sum(size(col("bv"))), lit(0L)))
      .head().getLong(0)
    val hint: DataFrame => DataFrame =
      if (blockDoubles <= broadcastMaxDoubles) broadcast else identity
    val tBands = reps.select(col("__tid"),
      explode(Similarity.bandBucketsProbed(reps, col("v"), bands = 8, r = 8)).as("bkt"))
    val bBands = breps.select(col("__bid"),
      explode(Similarity.bandBucketsProbed(breps, col("bv"), bands = 8, r = 8)).as("bkt"))
    val cand = tBands.join(hint(bBands), Seq("bkt"))
      .select(col("__tid"), col("__bid")).distinct()
    val contaminated = cand
      .join(reps, Seq("__tid"))
      .join(hint(breps), Seq("__bid"))
      .filter(Similarity.dot(col("v"), col("bv")) / (col("norm") * col("bn")) >= threshold)
      .select(col("__tid").as("__min")).distinct()
    grp.join(contaminated, Seq("__min"), "left_anti").drop("__min")
  }

  /** DuckDB replay of the embedding pair pipeline up to the verified
    * rep pairs (`upairs`) and the eligible-rep self-cosines
    * (`selfcos`) — shared by dd_embed_cos (appends the member-pair
    * expansion) and dd_embed_cluster (appends the recursive component
    * closure). The `nrm > 0` conjuncts mirror the Spark side's
    * explicit zero-norm gates (NaN would otherwise pass `>= 0.4` in
    * both engines — see [[embedEligibleReps]]). */
  /** One side's exact-vector groups (`<p>g`), double-cast group
    * representatives with norms (`<p>e`) and hyperplane band buckets
    * (`<p>b`) as prefixed CTEs over `srcRel` — the building block the
    * symmetric ([[embedOracleCtes]]) and asymmetric
    * (dd_embed_decontaminate) embedding oracles assemble from,
    * mirroring [[minhashSideCtes]]. The bucket comprehension is the
    * exact integer LCG of [[Similarity.bandBucketsProbed]] (bands=8,
    * r=8), so the candidate sets replay in DuckDB. */
  /** The DuckDB list comprehension computing a row's 8 hyperplane band
    * buckets from its double vector `v` — the exact integer LCG of
    * [[Similarity.bandBucketsProbed]] (bands=8, r=8), shared by every
    * embedding-family oracle. */
  private[graft] val embedBucketListSql: String =
    """[bb * 256 + list_sum([CASE WHEN list_dot_product(v,
                            [CAST(((1103515245::BIGINT * ((bb * 8 + q) * 1048576 + i) + 12345) % 2147483648) AS DOUBLE)
                               / 2147483648.0 - 0.5
                             for i in range(len(v))]) >= 0.0
                          THEN (1 << (7 - q)) ELSE 0 END
                          for q in range(8)])
                        for bb in range(8)]"""

  private def embedSideCtes(p: String, srcRel: String): String =
    s"""${p}g AS (
                SELECT vec_id, embedding,
                       min(vec_id) OVER (PARTITION BY embedding) AS mn
                FROM $srcRel),
              ${p}e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS nrm
                FROM ${p}g WHERE vec_id = mn),
              ${p}b AS (
                SELECT vec_id,
                       $embedBucketListSql AS bkts
                FROM ${p}e)"""

  private lazy val embedOracleCtes: String =
    s"""${embedSideCtes("", "embeddings")},
              cand AS (
                SELECT a.vec_id AS id_a, c.vec_id AS id_b
                FROM b a JOIN b c ON a.vec_id < c.vec_id
                WHERE len(list_intersect(a.bkts, c.bkts)) > 0),
              upairs AS (
                SELECT cand.id_a, cand.id_b,
                       list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cos
                FROM cand
                JOIN e x ON x.vec_id = cand.id_a
                JOIN e y ON y.vec_id = cand.id_b
                WHERE x.nrm > 0 AND y.nrm > 0
                  AND list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.4),
              selfcos AS (
                SELECT vec_id AS mn, list_dot_product(v, v) / (nrm * nrm) AS cos
                FROM e
                WHERE nrm > 0
                  AND list_dot_product(v, v) / (nrm * nrm) >= 0.4)"""

  /** Shared oracle CTE chain replaying [[minhashNearDups]] in DuckDB
    * up to the verified (id_a, id_b, sim) pair set; consumers append
    * their own threshold filter / anti-join. */
  private lazy val minhashOracleCtes: String = minhashOracleCtesFrom("documents")

  /** One side of the minhash pipeline as prefixed CTEs
    * (`<p>t`/`<p>ne`/`<p>xb`/`<p>sig`/`<p>bands`) over `docsRel` — the
    * building block both the symmetric ([[minhashOracleCtesFrom]]) and
    * asymmetric (dd_decontaminate) oracles assemble from. */
  private[graft] def minhashSideCtes(p: String, docsRel: String): String = {
    import graft.functions.PortableHash.{duckdbUhApply, duckdbUhBase}
    val slots = (0 until 32).map(i =>
      s"list_min([${duckdbUhApply(i, "x")} for x in xs])")
      .mkString(",\n                         ")
    val bandKeys = (0 until 16).map(i =>
      s"md5('$i' || ',' || CAST(m[${2 * i + 1}] AS VARCHAR) || ',' || CAST(m[${2 * i + 2}] AS VARCHAR))")
      .mkString(",\n                         ")
    s"""${p}t AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(toks) >= 3
                   THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
                   ELSE [] END) AS grams
          FROM (SELECT doc_id,
                       [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
                FROM $docsRel)),
        ${p}ne AS (SELECT doc_id, grams FROM ${p}t WHERE len(grams) > 0),
        ${p}xb AS (SELECT doc_id,
                 list_distinct([${duckdbUhBase("g")} for g in grams]) AS xs
               FROM ${p}ne),
        ${p}sig AS (SELECT doc_id,
                   [$slots] AS m
                FROM ${p}xb),
        ${p}bands AS (SELECT doc_id,
                   unnest([$bandKeys]) AS band
                  FROM ${p}sig)"""
  }

  /** The dd_decontaminate oracle: the 20/80 md5 id split, both sides'
    * minhash pipelines, banded candidates, exact-jaccard contamination
    * at t = 0.5, training anti-join. SHARED with w_decontaminate (the
    * broadcast-index online form): identical semantics by
    * construction, so the driver's hash-compare holds the two plans to
    * bit-equality. */
  private[graft] lazy val decontaminateOracleSql: String = {
    val split = """(SELECT *,
                    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS bucket
                    FROM documents)"""
    s"""WITH tr AS (SELECT doc_id, text, source, n_chars FROM $split WHERE bucket >= 20),
        bm AS (SELECT doc_id, text FROM $split WHERE bucket < 20),
        ${minhashSideCtes("a_", "tr")},
        ${minhashSideCtes("b_", "bm")},
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM a_bands a JOIN b_bands b ON a.band = b.band),
        contaminated AS (
          SELECT DISTINCT c.id_a AS doc_id
          FROM cand c
          JOIN a_xb xa ON xa.doc_id = c.id_a
          JOIN b_xb xb2 ON xb2.doc_id = c.id_b
          WHERE CAST(len(list_intersect(xa.xs, xb2.xs)) AS DOUBLE)
                / (len(xa.xs) + len(xb2.xs) - len(list_intersect(xa.xs, xb2.xs))) >= 0.5)
        SELECT doc_id, source, n_chars FROM tr
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        ORDER BY doc_id"""
  }

  /** [[minhashOracleCtes]] with the doc source parameterized —
    * dd_apply_lsh feeds exact-content group representatives instead of
    * the full corpus. */
  private[graft] def minhashOracleCtesFrom(docsRel: String): String =
    s"""WITH ${minhashSideCtes("", docsRel)},
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.doc_id < b.doc_id),
        verified AS (
          SELECT c.id_a, c.id_b,
                 CAST(len(list_intersect(xa.xs, xb2.xs)) AS DOUBLE)
                   / (len(xa.xs) + len(xb2.xs) - len(list_intersect(xa.xs, xb2.xs))) AS sim
          FROM cand c
          JOIN xb xa ON xa.doc_id = c.id_a
          JOIN xb xb2 ON xb2.doc_id = c.id_b)"""

  /** The dd_minhash_lsh pair set — (id_a, id_b, sim) at t = 0.5 —
    * factored out so dd_cross_source can aggregate over the SAME
    * pairs. collapseExpandPairs' contract holds because identical
    * texts share signatures, bands, and exact hash-set Jaccard, so
    * rep pairs reproduce every cross-group pair's sim, and
    * within-group member pairs have sim = 1.0 exactly (n/n) — gated
    * by rep eligibility (nonempty shingles). */
  private[graft] def minhashLshPairs(docs: DataFrame): DataFrame =
    collapseExpandPairs(docs, "doc_id", Seq(md5(lower(col("text"))))) { reps =>
      minhashNearDups(
        reps.select(col("doc_id"), col("text")), col("doc_id"), col("text"), 0.5)
    } { reps =>
      reps.filter(size(graft.functions.TextShingles.wordShingles(col("text"), 3)) > 0)
        .select(col("doc_id").as("__min"), lit(1.0).as("sim"))
    }

  /** [[minhashLshPairs]] replayed in DuckDB — shared verbatim between
    * dd_minhash_lsh and dd_cross_source (which wraps it as a
    * subquery), so both queries pin the same pair set. */
  private[graft] lazy val minhashLshPairsOracleSql: String = {
    val reps = """(SELECT doc_id, text FROM (
                    SELECT doc_id, text,
                           min(doc_id) OVER (PARTITION BY md5(lower(text))) AS mn
                    FROM documents) WHERE doc_id = mn)"""
    s"""${minhashOracleCtesFrom(reps)},
        gm AS (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS mn
          FROM documents),
        upairs AS (SELECT id_a, id_b, sim FROM verified WHERE sim >= 0.5),
        cross_pairs AS (
          SELECT least(ma.doc_id, mb.doc_id) AS id_a,
                 greatest(ma.doc_id, mb.doc_id) AS id_b, u.sim
          FROM upairs u
          JOIN gm ma ON ma.mn = u.id_a
          JOIN gm mb ON mb.mn = u.id_b),
        within_pairs AS (
          SELECT x.doc_id AS id_a, y.doc_id AS id_b, 1.0 AS sim
          FROM gm x JOIN gm y ON x.mn = y.mn AND x.doc_id < y.doc_id
          JOIN ne ON ne.doc_id = x.mn)
        SELECT id_a, id_b, sim FROM cross_pairs
        UNION ALL
        SELECT id_a, id_b, sim FROM within_pairs
        ORDER BY id_a, id_b"""
  }

  val queries: Seq[QueryDef] = Seq(

    // Exact dedup groups over the content hash; every group here has
    // n_docs = 1 in clean data, so the query also proves no false
    // positives — and at 100 TB it is a single count-style shuffle.
    QueryDef(
      "dd_exact",
      (s, d) => {
        import s.implicits._
        exactGroups(table(s, d, "documents"), $"text", $"doc_id")
          .orderBy($"content_hash")
      },
      Some("""SELECT md5(lower(text)) AS content_hash,
                     min(doc_id) AS keeper, count(*) AS n_docs
              FROM documents GROUP BY 1 ORDER BY content_hash""")),

    // Cross-document duplicated 8-gram spans (exact-substring dedup,
    // n-gram form — see dupNgramStats): per doc, how much of it occurs
    // verbatim elsewhere in the corpus. The oracle replays the same
    // 60-bit portable gram hash, so the whole posting pipeline — not
    // just the output shape — is hash-compared.
    QueryDef(
      "dd_dup_ngrams",
      (s, d) => {
        import s.implicits._
        dupNgramStats(table(s, d, "documents"), $"doc_id", $"text", n = 8)
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id,
                       [x for x in string_split_regex(lower(text), '\s+') if x != ''] AS toks
                FROM documents),
              g AS (
                SELECT doc_id,
                       CASE WHEN len(toks) >= 8
                            THEN list_distinct([array_to_string(toks[i:i+7], ' ')
                                                for i in range(1, len(toks) - 6)])
                            ELSE [] END AS grams
                FROM t),
              x AS (
                SELECT doc_id, ('0x' || substring(md5(gram), 1, 15))::BIGINT AS h
                FROM (SELECT doc_id, unnest(grams) AS gram FROM g)),
              c AS (SELECT h, count(*) AS nd FROM x GROUP BY h HAVING count(*) >= 2),
              p AS (
                SELECT x.doc_id, count(*) AS n_dup
                FROM x JOIN c USING (h) GROUP BY x.doc_id)
              SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams,
                     CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_grams,
                     CAST(coalesce(p.n_dup, 0) AS DOUBLE)
                       / greatest(len(g.grams), 1) AS dup_ratio
              FROM g LEFT JOIN p USING (doc_id)
              ORDER BY g.doc_id""")),

    // Longest verbatim duplicated span per document (positional
    // refinement of dd_dup_ngrams — see dupNgramSpans): r consecutive
    // duplicated 8-gram positions = an (r+7)-token copied span. The
    // islands-and-gaps window replays exactly in the oracle.
    QueryDef(
      "dd_dup_spans",
      (s, d) => {
        import s.implicits._
        dupNgramSpans(table(s, d, "documents"), $"doc_id", $"text", n = 8)
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id,
                       [x for x in string_split_regex(lower(text), '\s+') if x != ''] AS toks
                FROM documents),
              p AS (
                SELECT doc_id, u.g['pos'] AS pos,
                       ('0x' || substring(md5(u.g['gram']), 1, 15))::BIGINT AS h
                FROM (
                  SELECT doc_id,
                         unnest([{'pos': i, 'gram': array_to_string(toks[i:i+7], ' ')}
                                 for i in range(1, len(toks) - 6)]) AS g
                  FROM t WHERE len(toks) >= 8) u),
              x AS (SELECT DISTINCT doc_id, h FROM p),
              c AS (SELECT h FROM x GROUP BY h HAVING count(*) >= 2),
              d AS (
                SELECT p.doc_id, p.pos,
                       p.pos - row_number() OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS island
                FROM p JOIN c USING (h)),
              runs AS (
                SELECT doc_id, count(*) AS run_len
                FROM d GROUP BY doc_id, island),
              agg AS (
                SELECT doc_id, sum(run_len) AS n_dup_pos, max(run_len) AS longest_run
                FROM runs GROUP BY doc_id)
              SELECT t.doc_id,
                     CAST(greatest(len(t.toks) - 7, 0) AS BIGINT) AS n_gram_pos,
                     CAST(coalesce(a.n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
                     CAST(CASE WHEN a.longest_run IS NULL THEN 0
                               ELSE a.longest_run + 7 END AS BIGINT) AS longest_dup_tokens
              FROM t LEFT JOIN agg a USING (doc_id)
              ORDER BY t.doc_id""")),

    // Exact-substring dedup APPLIED (see applySpanDedup): excise every
    // token covered by a non-canonical duplicated-8-gram occurrence,
    // keep the globally-first copy. The oracle replays occurrence
    // hashing, canonical struct-min selection, and the per-token
    // interval-coverage filter, then md5-pins the surviving text.
    QueryDef(
      "dd_apply_spans",
      (s, d) => {
        import s.implicits._
        applySpanDedup(table(s, d, "documents"), $"doc_id", $"text", n = 8)
          .orderBy($"doc_id")
      },
      Some(s"""WITH ${spanExcisionCtes("", "documents")}
              SELECT doc_id, n_tokens, n_removed,
                     md5(kept_text) AS kept_md5
              FROM x ORDER BY doc_id""")),

    // Directional containment pairs at C >= 0.9 (see containmentPairs
    // — the asymmetric case Jaccard misses). The oracle is the NAIVE
    // all-pairs containment over the same portable uh30 gram sets:
    // the engine's prefix-filtered plan must reproduce it exactly,
    // so candidate COMPLETENESS itself is what the compare checks.
    QueryDef(
      "dd_containment",
      (s, d) => {
        import s.implicits._
        containmentPairs(table(s, d, "documents"), tn = 9, td = 10)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH t AS (
                SELECT doc_id, [x for x in string_split_regex(lower(text), '\s+') if x != ''] AS toks
                FROM documents),
              g AS (
                SELECT doc_id,
                       CASE WHEN len(toks) >= 3
                            THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                                for i in range(1, len(toks) - 1)])
                            ELSE [] END AS grams
                FROM t),
              h AS (
                SELECT doc_id,
                       list_distinct([(('0x' || substring(md5(x), 1, 15))::BIGINT % 1073741824)
                                      for x in grams]) AS hs
                FROM g),
              n AS (SELECT doc_id, hs, len(hs) AS n FROM h WHERE len(hs) >= 5),
              pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
                       CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter
                FROM n a JOIN n b ON a.doc_id <> b.doc_id)
              SELECT id_a, id_b, n_a, n_b, inter,
                     CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
              FROM pairs WHERE inter * 10 >= n_a * 9
              ORDER BY id_a, id_b""")),

    // Banded brute-force n-gram Jaccard: candidate pairs restricted to
    // adjacent length bands (near-dups have near-equal lengths) — the
    // oracle-checkable ground truth the probabilistic variants are
    // validated against. Spark-first blocking: each doc explodes to
    // band keys {b, b+1}, so adjacency becomes a plain equi-join
    // (shuffled hash join) instead of a non-equi nested-loop join.
    // Pairwise cost controls: grams are 64-bit hashes (not strings),
    // and a size-ratio prefilter kills pairs that cannot reach the
    // threshold (J >= t implies |A|/|B| in [t, 1/t]) before any set op.
    QueryDef(
      "dd_ngram_jaccard",
      (s, d) => {
        import s.implicits._
        // Prefix-filtered set-similarity join at t = 0.2 (Bayardo
        // WWW'07 + PPJoin length/positional filters — see
        // prefixCandidates): candidate volume is bounded by prefix
        // collisions, NOT Σ df(gram)² — a hot gram indexes only in
        // the df-ASC suffix and never joins, so the plan survives a
        // corpus where one band shares a stop-gram. The band-adjacency
        // block (near-dups have near-equal lengths; semantics of this
        // query) rides the candidate equi-join key via side-a key
        // replication {band-1, band, band+1}. Grams are 64-bit
        // xxhash64 identities (collision odds ~n²/2⁻⁶⁴ per doc —
        // negligible, and the count-based verify is exact over them).
        // Pair-output collapse+expand (collapseExpandPairs), grouped
        // on (content, n_chars) because the length band keys on
        // n_chars: twins share postings AND bands, so rep pairs
        // reproduce every cross-group sim and within-group member
        // pairs are sim = 1.0 (gated on the rep having grams —
        // gramless docs never post).
        collapseExpandPairs(table(s, d, "documents"), "doc_id",
            Seq(md5(lower($"text")), $"n_chars")) { reps =>
          val banded = reps.select($"doc_id", $"text",
            floor($"n_chars" / lit(50)).cast("int").as("band"))
          val (_, cand) = prefixCandidates(
            banded, tn = 1, td = 5, hashKind = "xx64", banded = true)
          // Verify per PAIR on sorted in-row gram arrays (PPJoin-style
          // verification): at t = 0.2 prefixes hold ~80% of postings,
          // so the candidate set is collision-rich (sf0.1: 190k pairs
          // for 25 survivors) and the former postings-join verify
          // expanded each pair by its FULL posting set — 13M join rows
          // shuffled to count 25 intersections. Joining the candidate
          // PAIRS (two narrow equi-joins) against one array row per
          // doc and counting with the codegen'd two-pointer merge
          // moves 2x|cand| rows instead — Σ|grams| bytes ride the
          // join value, never a per-gram row explosion.
          val arrays = banded.select($"doc_id",
            sort_array(graft.functions.TextShingles
              .hashedWordShingles($"text", 3, "xx64")).as("xs"))
          val inter = graft.functions.TextShingles
            .sortedLongIntersectCount($"xsa", $"xsb")
          cand
            .join(arrays.select($"doc_id".as("id_a"), $"xs".as("xsa")), Seq("id_a"))
            .join(arrays.select($"doc_id".as("id_b"), $"xs".as("xsb")), Seq("id_b"))
            .withColumn("inter", inter)
            .select($"id_a", $"id_b", ($"inter".cast("double") /
              (size($"xsa") + size($"xsb") - $"inter")).as("sim"))
            .filter($"sim" >= 0.2)
        } { reps =>
          reps.filter(size(graft.functions.TextShingles.wordShingles($"text", 3)) > 0)
            .select($"doc_id".as("__min"), lit(1.0).as("sim"))
        }
      },
      Some("""WITH t AS (
                SELECT doc_id, floor(n_chars / 50) AS band,
                       list_distinct(CASE WHEN len(toks) >= 3
                         THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
                         ELSE [] END) AS grams
                FROM (SELECT doc_id, n_chars,
                             [x for x in string_split_regex(lower(text), '\s+') if x != ''] AS toks
                      FROM documents))
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                       / len(list_distinct(a.grams || b.grams)) AS sim
              FROM t a JOIN t b ON abs(a.band - b.band) <= 1 AND a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                      / len(list_distinct(a.grams || b.grams)) >= 0.2
              ORDER BY id_a, id_b""")),

    // MinHash+LSH near-dup pipeline (shingle -> 32-hash signature ->
    // 16 bands of 2 -> bucket join -> exact-Jaccard verify). The
    // portable md5-prefix hash family lets DuckDB replay the ENTIRE
    // pipeline — signatures, banding, candidate join, verify — so the
    // probabilistic operator is hash-checked end to end, not rows-only.
    QueryDef(
      "dd_minhash_lsh",
      (s, d) => minhashLshPairs(table(s, d, "documents")),
      Some(minhashLshPairsOracleSql)),

    // Cross-source duplication matrix: the dd_minhash_lsh pair set
    // labeled by each side's source and counted per (unordered)
    // source pair — the provenance view a corpus audit runs to see
    // which sources copy from which (and how much self-duplication
    // each carries). Pairs are pair-bound (never all-pairs); the two
    // label joins key the SMALL pair side against the corpus-sized
    // (doc_id, source) projection, and the final aggregate has at
    // most |sources|^2 groups.
    QueryDef(
      "dd_cross_source",
      (s, d) => {
        import s.implicits._
        val src = table(s, d, "documents").select($"doc_id", $"source")
        minhashLshPairs(table(s, d, "documents"))
          .join(src.select($"doc_id".as("id_a"), $"source".as("src_a")), Seq("id_a"))
          .join(src.select($"doc_id".as("id_b"), $"source".as("src_b")), Seq("id_b"))
          .groupBy(
            least($"src_a", $"src_b").as("source_a"),
            greatest($"src_a", $"src_b").as("source_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy($"source_a", $"source_b")
      },
      Some(s"""SELECT least(da.source, db.source) AS source_a,
                      greatest(da.source, db.source) AS source_b,
                      count(*) AS n_pairs
               FROM ($minhashLshPairsOracleSql) p
               JOIN documents da ON da.doc_id = p.id_a
               JOIN documents db ON db.doc_id = p.id_b
               GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Applied dedup AT SCALE: the corpus minus docs dominated by a
    // lower-id minhash near-dup partner — the production form of
    // dd_apply (whose inverted-index ground truth has no banding and
    // therefore an unbanded Σ df² intermediate). This one's candidate
    // generation is LSH-bounded end to end, and the whole pipeline
    // still replays in the oracle.
    QueryDef(
      "dd_apply_lsh",
      (s, d) => {
        import s.implicits._
        applyLshSurvivors(table(s, d, "documents"))
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some {
        val reps = """(SELECT doc_id, text FROM (
                        SELECT doc_id, text,
                               min(doc_id) OVER (PARTITION BY md5(lower(text))) AS mn
                        FROM documents) WHERE doc_id = mn)"""
        s"""${minhashOracleCtesFrom(reps)},
            gm AS (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS mn
              FROM documents),
            twin AS (
              SELECT g.doc_id FROM gm g JOIN ne ON ne.doc_id = g.mn
              WHERE g.doc_id != g.mn),
            dominated AS (
              SELECT DISTINCT id_b AS doc_id FROM verified WHERE sim >= 0.5
              UNION SELECT doc_id FROM twin)
            SELECT doc_id, source, n_chars FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM dominated)
            ORDER BY doc_id"""
      }),

    // Incremental dedup (see lshIncrementSurvivors): day-2 ingest
    // against the frozen day-1 index. The batch re-ingests the first
    // 30 docs three ways — verbatim (+1,000,000: exact corpus twins,
    // dominated by the corpus at sim 1.0), and TWO identical 40-char
    // prefixes (+2,000,000 / +3,000,000: mostly novel vs the full
    // corpus texts — a short prefix shares few 3-shingles with its
    // long original — but sim 1.0 against each other, so keep-first
    // retains the +2M copy and drops the +3M one). Every admission
    // decision replays in the oracle from the shared side fragments.
    QueryDef(
      "dd_lsh_increment",
      (s, d) => lshIncrementQuery(s, d)(lshIncrementSurvivors(_, _)),
      Some(lshIncrementOracle)),

    // Durable dedup-index round-trip: the same day-2 admission, but
    // the frozen corpus index (signatures + band postings) is WRITTEN
    // to parquet and RELOADED before the batch is admitted — the
    // cross-session deployment cycle under the same oracle (the
    // round-trip is value-exact, so the replay is identical to
    // dd_lsh_increment's). IndexStoreSpec pins admission-decision
    // equality against the leased path in a fresh session.
    QueryDef(
      "dd_lsh_stored",
      (s, d) => lshIncrementQuery(s, d)(lshStoredSurvivors(_, _)),
      Some(lshIncrementOracle)),

    // Dedup-index TAKEDOWN under the oracle: the stored corpus index
    // is COMPACTED by a document tombstone set (ids < 10 — "forget
    // these documents") before the batch is admitted. Forgotten
    // originals provably stop suppressing their verbatim twins: the
    // +1M copies of docs 0-9 now survive the corpus check (their
    // within-batch fate unchanged), and the replay is the increment
    // oracle against `documents` minus the forgotten ids — which is
    // exactly the compaction contract IndexStoreSpec pins bit-equal.
    QueryDef(
      "dd_lsh_takedown",
      (s, d) => {
        import s.implicits._
        lshIncrementQuery(s, d)(lshTakedownSurvivors(_, _,
          s.range(0, 10).select($"id")))
      },
      Some(lshIncrementOracleFor("(SELECT * FROM documents WHERE doc_id >= 10)")))
  ) ++ querySeq2

  /** The shared day-2 fixture of `dd_lsh_increment` / `dd_lsh_stored`:
    * the first 30 docs re-ingested three ways — verbatim (+1,000,000)
    * and two identical 40-char prefixes (+2,000,000 / +3,000,000) —
    * admitted by `admit(base, batch)`. */
  private def lshIncrementQuery(s: SparkSession, d: String)(
      admit: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    import s.implicits._
    val base = table(s, d, "documents").select($"doc_id", $"text")
    val b0 = base.filter($"doc_id" < 30)
    val batch = b0.select(($"doc_id" + 1000000L).as("doc_id"), $"text")
      .unionByName(b0.select(($"doc_id" + 2000000L).as("doc_id"),
        substring($"text", 1, 40).as("text")))
      .unionByName(b0.select(($"doc_id" + 3000000L).as("doc_id"),
        substring($"text", 1, 40).as("text")))
    admit(base, batch)
      .select($"doc_id", md5($"text").as("content_md5"))
      .orderBy($"doc_id")
  }

  private lazy val lshIncrementOracle: String = lshIncrementOracleFor("documents")

  /** The increment replay parameterized by the CORPUS relation — the
    * takedown form replays admission against `documents` minus the
    * forgotten ids, which is exactly what compaction must equal. */
  private def lshIncrementOracleFor(corpusRel: String): String = {
        val jac = (a: String, o: String) =>
          s"""CAST(len(list_intersect($a.xs, $o.xs)) AS DOUBLE)
                / (len($a.xs) + len($o.xs) - len(list_intersect($a.xs, $o.xs)))"""
        s"""WITH nb AS (
              SELECT doc_id + 1000000 AS doc_id, text
              FROM documents WHERE doc_id < 30
              UNION ALL
              SELECT doc_id + 2000000 AS doc_id, substring(text, 1, 40) AS text
              FROM documents WHERE doc_id < 30
              UNION ALL
              SELECT doc_id + 3000000 AS doc_id, substring(text, 1, 40) AS text
              FROM documents WHERE doc_id < 30),
            ${minhashSideCtes("o_", corpusRel)},
            ${minhashSideCtes("n_", "nb")},
            candc AS (
              SELECT DISTINCT a.doc_id AS id_n, o.doc_id AS id_o
              FROM n_bands a JOIN o_bands o ON a.band = o.band),
            candb AS (
              SELECT DISTINCT a.doc_id AS id_n, p.doc_id AS id_o
              FROM n_bands a JOIN n_bands p
                ON a.band = p.band AND p.doc_id < a.doc_id),
            domc AS (
              SELECT DISTINCT c.id_n FROM candc c
              JOIN n_xb xa ON xa.doc_id = c.id_n
              JOIN o_xb xo ON xo.doc_id = c.id_o
              WHERE ${jac("xa", "xo")} >= 0.5),
            domb AS (
              SELECT DISTINCT c.id_n FROM candb c
              JOIN n_xb xa ON xa.doc_id = c.id_n
              JOIN n_xb xo ON xo.doc_id = c.id_o
              WHERE ${jac("xa", "xo")} >= 0.5),
            dom AS (SELECT id_n FROM domc UNION SELECT id_n FROM domb)
            SELECT doc_id, md5(text) AS content_md5 FROM nb
            WHERE doc_id NOT IN (SELECT id_n FROM dom)
            ORDER BY doc_id"""
  }

  /** The shared day-2 fixture of `dd_embed_increment` /
    * `dd_embed_stored`: the first 30 vectors re-ingested verbatim
    * (+1,000,000) and negated twice (+2,000,000 / +3,000,000) —
    * admitted by `admit(base, batch)`. */
  private def embedIncrementQuery(s: SparkSession, d: String)(
      admit: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    import s.implicits._
    val base = table(s, d, "embeddings").select($"vec_id", $"embedding")
    val b0 = base.filter($"vec_id" < 30)
    val neg = transform($"embedding", x => -x).as("embedding")
    val batch = b0.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
      .unionByName(b0.select(($"vec_id" + 2000000L).as("vec_id"), neg))
      .unionByName(b0.select(($"vec_id" + 3000000L).as("vec_id"), neg))
    admit(base, batch)
      .select($"vec_id", size($"embedding").cast("long").as("n_dims"))
      .orderBy($"vec_id")
  }

  private lazy val embedIncrementOracle: String = embedIncrementOracleFor("embeddings")

  /** The vector-increment replay parameterized by the CORPUS relation
    * — the takedown twin of [[lshIncrementOracleFor]]. */
  private def embedIncrementOracleFor(corpusRel: String): String = {
    def side(p: String, rel: String) =
      s"""${p}e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS nrm
            FROM $rel),
          ${p}e1 AS (SELECT * FROM ${p}e WHERE nrm > 0),
          ${p}b AS (SELECT vec_id, $embedBucketListSql AS bkts FROM ${p}e1)"""
    s"""WITH nb AS (
          SELECT vec_id + 1000000 AS vec_id, embedding
          FROM embeddings WHERE vec_id < 30
          UNION ALL
          SELECT vec_id + 2000000 AS vec_id,
                 [-x for x in embedding] AS embedding
          FROM embeddings WHERE vec_id < 30
          UNION ALL
          SELECT vec_id + 3000000 AS vec_id,
                 [-x for x in embedding] AS embedding
          FROM embeddings WHERE vec_id < 30),
        ${side("o_", corpusRel)},
        ${side("n_", "nb")},
        candc AS (
          SELECT DISTINCT a.vec_id AS id_n, o.vec_id AS id_o
          FROM n_b a JOIN o_b o
            ON len(list_intersect(a.bkts, o.bkts)) > 0),
        candb AS (
          SELECT DISTINCT a.vec_id AS id_n, p.vec_id AS id_o
          FROM n_b a JOIN n_b p
            ON p.vec_id < a.vec_id
           AND len(list_intersect(a.bkts, p.bkts)) > 0),
        domc AS (
          SELECT DISTINCT c.id_n FROM candc c
          JOIN n_e1 x ON x.vec_id = c.id_n
          JOIN o_e1 y ON y.vec_id = c.id_o
          WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.4),
        domb AS (
          SELECT DISTINCT c.id_n FROM candb c
          JOIN n_e1 x ON x.vec_id = c.id_n
          JOIN n_e1 y ON y.vec_id = c.id_o
          WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.4),
        dom AS (SELECT id_n FROM domc UNION SELECT id_n FROM domb)
        SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims FROM nb
        WHERE vec_id NOT IN (SELECT id_n FROM dom)
        ORDER BY vec_id"""
  }

  private lazy val querySeq2: Seq[QueryDef] = Seq(

    // Incremental embedding dedup (see embedIncrementSurvivors): the
    // vector twin of dd_lsh_increment over the same day-2 shape. The
    // batch re-ingests the first 30 vectors verbatim (+1,000,000:
    // cosine 1.0 against their corpus originals — dominated) and
    // NEGATED twice (+2,000,000 / +3,000,000: cos(-v, v) = -1, so a
    // negated copy only falls to the corpus if some corpus vector
    // anti-correlates at <= -0.4 with the original — mostly novel —
    // while the two negated copies sit at cosine 1.0 with each other,
    // so keep-first retains the +2M copy and drops the +3M one).
    // Every admission decision replays from the shared hyperplane
    // bucket comprehension.
    QueryDef(
      "dd_embed_increment",
      (s, d) => embedIncrementQuery(s, d)(embedIncrementSurvivors(_, _)),
      Some(embedIncrementOracle)),

    // Durable VECTOR-index round-trip: the same day-2 admission, but
    // the frozen vector corpus index (prepped vectors + bucket
    // postings) is WRITTEN to parquet and RELOADED before the batch
    // is admitted — the embedding twin of dd_lsh_stored, under
    // dd_embed_increment's oracle verbatim (the round-trip is
    // value-exact). IndexStoreSpec pins admission-decision equality
    // against the leased path in a fresh session.
    QueryDef(
      "dd_embed_stored",
      (s, d) => embedIncrementQuery(s, d)(embedStoredSurvivors(_, _)),
      Some(embedIncrementOracle)),

    // VECTOR-index takedown under the oracle — the embedding twin of
    // dd_lsh_takedown: the stored vector index compacted by vec_ids
    // < 10 before admission; the forgotten originals stop dominating
    // their verbatim +1M twins, and the replay is the increment
    // oracle against `embeddings` minus the forgotten ids.
    QueryDef(
      "dd_embed_takedown",
      (s, d) => {
        import s.implicits._
        embedIncrementQuery(s, d)(embedTakedownSurvivors(_, _,
          s.range(0, 10).select($"id".as("vec_id"))))
      },
      Some(embedIncrementOracleFor("(SELECT * FROM embeddings WHERE vec_id >= 10)"))),

    // Decontamination: scrub the training split of everything that
    // near-matches the benchmark split (the held-out 20% by the same
    // deterministic md5 split q_hash_split uses — pure id arithmetic,
    // so the split itself replays in the oracle). Asymmetric minhash:
    // candidates from the banded equi-join of the two sides' band sets
    // with the BENCHMARK side broadcast, verify = exact hash-set
    // jaccard, survivors = training anti-join contaminated ids.
    QueryDef(
      "dd_decontaminate",
      (s, d) => {
        import s.implicits._
        val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("int") % 100
        val docs = table(s, d, "documents").withColumn("__bucket", bucket)
        val training = docs.filter($"__bucket" >= 20).drop("__bucket")
        val benchmark = docs.filter($"__bucket" < 20).drop("__bucket")
        decontaminate(training, benchmark, "doc_id", $"text", 0.5)
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some(decontaminateOracleSql)),

    // SimHash signatures + hamming-banded near-dup pairs (<= 3 bits
    // apart; with four equal chunks the pigeonhole guarantee of a
    // shared chunk holds exactly for hamming < 4, so the chunk
    // equi-join has perfect recall at this threshold — a looser
    // threshold would need more/smaller chunks). Uses the portable
    // 60-bit md5-prefix token hash (4 chunks x 15 bits) so DuckDB
    // replays signatures, banding and hamming verify exactly.
    QueryDef(
      "dd_simhash",
      (s, d) => {
        import s.implicits._
        // collapseExpandPairs contract holds because identical texts
        // share the token multiset, hence the signature, hence every
        // chunk bucket; rep pairs reproduce every cross-group pair's
        // hamming, within-group member pairs are hamming 0 (gated on
        // the rep having >= 1 token — tokenless docs emit no signature
        // and never pair).
        collapseExpandPairs(table(s, d, "documents"), "doc_id",
            Seq(md5(lower($"text")))) { reps =>
          val sigs = simhashChunksAggCounted(
              reps, $"doc_id", $"text",
              hash = c => graft.functions.PortableHash.md5Hash60(c),
              bits = 60)
            .withColumnRenamed("id", "doc_id")
          val chunked = sigs
            .withColumn("chunk_id", explode(sequence(lit(0), lit(3))))
            .withColumn("chunk", element_at($"sig", $"chunk_id" + lit(1)))
          val a = chunked.select($"chunk_id", $"chunk", $"doc_id".as("id_a"), $"sig".as("sig_a"))
          val b = chunked.select($"chunk_id", $"chunk", $"doc_id".as("id_b"), $"sig".as("sig_b"))
          a.join(b, Seq("chunk_id", "chunk"))
            .filter($"id_a" < $"id_b")
            .select($"id_a", $"id_b", hammingChunks($"sig_a", $"sig_b").as("hamming"))
            .filter($"hamming" <= 3)
            .distinct()
        } { reps =>
          reps.filter(size(tokens($"text")) > 0)
            .select($"doc_id".as("__min"), lit(0).as("hamming"))
        }
      },
      Some {
        val chunkExprs = (0 until 4).map { c =>
          "(" + (0 until 15).map { j =>
            val bit = 15 * c + j
            s"(CASE WHEN 2 * len([x for x in hs if (x >> $bit) & 1 = 1]) > n THEN ${1 << (14 - j)} ELSE 0 END)"
          }.mkString(" + ") + ")"
        }.mkString(",\n                       ")
        s"""WITH gm AS (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS mn
              FROM documents),
            t AS (
              SELECT doc_id,
                     [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
              FROM (SELECT doc_id, text FROM (
                      SELECT doc_id, text,
                             min(doc_id) OVER (PARTITION BY md5(lower(text))) AS mn
                      FROM documents) WHERE doc_id = mn)),
            h AS (
              SELECT doc_id,
                     [('0x' || substring(md5(t), 1, 15))::BIGINT for t in toks] AS hs,
                     len(toks) AS n
              FROM t WHERE len(toks) > 0),
            sg AS (
              SELECT doc_id,
                     [$chunkExprs] AS sig
              FROM h),
            ch AS (
              SELECT doc_id, sig, unnest(sig) AS chunk, unnest([0, 1, 2, 3]) AS chunk_id
              FROM sg),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                              a.sig AS sig_a, b.sig AS sig_b
              FROM ch a JOIN ch b
                ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk
               AND a.doc_id < b.doc_id),
            upairs AS (
              SELECT id_a, id_b,
                     CAST(list_sum([bit_count(xor(x[1]::BIGINT, x[2]::BIGINT))
                                    for x in list_zip(sig_a, sig_b)]) AS INT) AS hamming
              FROM cand
              WHERE CAST(list_sum([bit_count(xor(x[1]::BIGINT, x[2]::BIGINT))
                                   for x in list_zip(sig_a, sig_b)]) AS INT) <= 3),
            cross_pairs AS (
              SELECT least(ma.doc_id, mb.doc_id) AS id_a,
                     greatest(ma.doc_id, mb.doc_id) AS id_b, u.hamming
              FROM upairs u
              JOIN gm ma ON ma.mn = u.id_a
              JOIN gm mb ON mb.mn = u.id_b),
            within_pairs AS (
              SELECT x.doc_id AS id_a, y.doc_id AS id_b, CAST(0 AS INT) AS hamming
              FROM gm x JOIN gm y ON x.mn = y.mn AND x.doc_id < y.doc_id
              JOIN h ON h.doc_id = x.mn)
            SELECT id_a, id_b, hamming FROM cross_pairs
            UNION ALL
            SELECT id_a, id_b, hamming FROM within_pairs
            ORDER BY id_a, id_b"""
      }),

    // Applied dedup: the corpus with near-duplicates REMOVED — any doc
    // dominated by a lower-id near-dup partner is dropped (one
    // left-anti join against the pair set). This is the operator a
    // training-data pipeline actually runs; the pair queries above are
    // its evidence.
    //
    // EXACT ground truth with BOUNDED candidate generation via prefix
    // filtering (Bayardo et al., "Scaling Up All Pairs Similarity
    // Search", WWW'07): order each doc's gram set by (global df ASC,
    // gram ASC) and index only the first floor(n/2)+1 grams — for
    // Jaccard >= t a pair MUST share a gram inside both prefixes
    // (prefix length |x| - ceil(t*|x|) + 1, here t = 0.5), so the
    // candidate set is complete while stop-grams (df = d, formerly d^2
    // candidate rows each) sort to the suffix and never join. Grams
    // are PortableHash 30-bit md5-prefix hashes so BOTH engines
    // compute the identical (df, hash) total order and hash-set
    // Jaccard — the whole pipeline replays in DuckDB, same contract as
    // dd_minhash_lsh (collisions ~n^2/2^31 per doc affect both sides
    // identically).
    QueryDef(
      "dd_apply",
      (s, d) => {
        import s.implicits._
        // collapseApplySurvivors: identical texts have identical
        // shingle sets (J = 1), so each md5(lower(text)) group enters
        // the pairwise machinery only through its minimal doc_id and
        // every other eligible member (>= 1 shingle — groups are
        // content-homogeneous, so rep eligibility decides) is
        // dominated by that minimum outright. Duplicate-saturated
        // corpora (the 100 TB reality) then cost the pairwise stage
        // O(unique contents), not O(docs): ScaleSmoke's 20x-saturated
        // 100k corpus dropped 342s -> seconds with the identical
        // survivor set. Shingle-less docs (< 3 tokens) never enter
        // postings, can't be dominated, and pass through.
        collapseApplySurvivors(table(s, d, "documents"), "doc_id",
            Seq(md5(lower($"text")))) { reps =>
          reps.filter(size(graft.functions.TextShingles.wordShingles($"text", 3)) > 0)
        } { el =>
          val (posts, cand) = prefixCandidates(el.select($"doc_id", $"text"))
          // verify by postings-join intersection counts,
          // candidates-only: no gram arrays cross a shuffle and the
          // whole check is codegen'd joins + one hash-agg (an
          // interpreted per-pair array_intersect was 2.5x slower)
          val pa = posts.select($"doc_id".as("id_a"), $"n".as("n_a"), $"x")
          val pb = posts.select($"doc_id".as("id_b"), $"n".as("n_b"), $"x")
          cand
            .join(pa, Seq("id_a"))
            .join(pb, Seq("id_b", "x"))
            .groupBy($"id_a", $"id_b", $"n_a", $"n_b")
            .agg(count(lit(1)).as("inter"))
            .filter($"inter".cast("double") / ($"n_a" + $"n_b" - $"inter") >= 0.5)
            .select($"id_b".as("doc_id")).distinct()
        }
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some {
        import graft.functions.PortableHash.duckdbUhBase
        s"""WITH t AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(toks) >= 3
                       THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
                       ELSE [] END) AS grams
              FROM (SELECT doc_id,
                           [x for x in string_split_regex(lower(text), '\\s+') if x != ''] AS toks
                    FROM documents)),
            gmin AS (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS mn
              FROM documents),
            el AS (
              SELECT g.doc_id, g.mn FROM gmin g JOIN t ON t.doc_id = g.doc_id
              WHERE len(t.grams) > 0),
            xb AS (
              SELECT t.doc_id, list_distinct([${duckdbUhBase("g")} for g in grams]) AS xs
              FROM t JOIN el ON el.doc_id = t.doc_id AND el.doc_id = el.mn),
            post AS (SELECT doc_id, len(xs) AS n, unnest(xs) AS x FROM xb),
            dfx AS (SELECT x, count(*) AS df FROM post GROUP BY x),
            pref AS (
              SELECT doc_id, n, x FROM (
                SELECT p.doc_id, p.x, p.n,
                       row_number() OVER (PARTITION BY p.doc_id
                         ORDER BY d.df ASC, p.x ASC) AS rk
                FROM post p JOIN dfx d USING (x))
              WHERE rk <= n // 2 + 1),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM pref a JOIN pref b ON a.x = b.x AND a.doc_id < b.doc_id
               AND a.n * 2 >= b.n AND b.n * 2 >= a.n),
            dominated AS (
              SELECT DISTINCT cand.id_b AS doc_id
              FROM cand
              JOIN xb xa ON xa.doc_id = cand.id_a
              JOIN xb yb ON yb.doc_id = cand.id_b
              WHERE CAST(len(list_intersect(xa.xs, yb.xs)) AS DOUBLE)
                    / len(list_distinct(xa.xs || yb.xs)) >= 0.5
              UNION
              SELECT doc_id FROM el WHERE doc_id != mn)
            SELECT doc_id, source, n_chars FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM dominated)
            ORDER BY doc_id"""
      }),

    // Embedding-cosine near-dup, LSH-bounded end to end: candidates =
    // pairs colliding in any of 8 hyperplane bands (8 sign bits each —
    // Similarity.hyperplaneBandBuckets), verified at cosine >= 0.4
    // (this corpus has no planted vector dups; the threshold sits in
    // the observable tail). The band equi-join prunes ~2^8-fold per
    // band where the former label blocking was all-pairs within a
    // small fixed bucket set (O(N^2/L) — a scale-killer at 100x);
    // norms precomputed per row (one pass) so the verify join
    // multiplies, never re-normalizes. The LCG planes are exact
    // integer math in both engines, so the candidate set itself
    // replays in the oracle.
    QueryDef(
      "dd_embed_cos",
      (s, d) => {
        import s.implicits._
        // collapseExpandPairs over exact-vector groups: identical
        // embeddings share every band bucket and every cosine, so
        // verified rep pairs expand to member pairs with the rep
        // cosine (bitwise-identical doubles — identical inputs,
        // identical arithmetic). Within-group member pairs get the
        // rep's self-cosine (dot(v,v)/(norm*norm) — ~1.0 up to the
        // sqrt rounding both engines share), gated by the same
        // threshold. Candidate sets match the uncollapsed form exactly
        // (twins collide in ALL bands); ScaleSmoke's 20x-saturated 40k
        // vectors dropped 146s -> seconds with the quadratic left only
        // in the true output pairs.
        // the group key is a codegen'd BINARY fingerprint of the
        // vector, NOT the raw array<float>: keying on the float array
        // makes NormalizeFloatingNumbers wrap it in an interpreted
        // transform(...) that the window sort then evaluates per
        // comparison (FloatVectorBytes doc has the full autopsy);
        // bytes-equal <=> float-equal under grouping semantics, so the
        // groups — and the oracle, which partitions by embedding — are
        // unchanged
        collapseExpandPairs(embedAll(s, d), "vec_id", Seq($"vkey"))(
          embedRepPairs) { reps =>
          embedEligibleReps(reps)
            .select($"vec_id".as("__min"),
              (Similarity.dot($"v", $"v") / ($"norm" * $"norm")).as("cos"))
        }
      },
      Some(s"""WITH $embedOracleCtes,
              cross_pairs AS (
                SELECT least(ma.vec_id, mb.vec_id) AS id_a,
                       greatest(ma.vec_id, mb.vec_id) AS id_b, u.cos
                FROM upairs u
                JOIN g ma ON ma.mn = u.id_a
                JOIN g mb ON mb.mn = u.id_b),
              within_pairs AS (
                SELECT x.vec_id AS id_a, y.vec_id AS id_b, s.cos
                FROM g x JOIN g y ON x.mn = y.mn AND x.vec_id < y.vec_id
                JOIN selfcos s ON s.mn = x.mn)
              SELECT id_a, id_b, cos FROM cross_pairs
              UNION ALL
              SELECT id_a, id_b, cos FROM within_pairs
              ORDER BY id_a, id_b""")),

    // Embedding near-dup CLUSTERS: connected components over the
    // verified cosine pair graph — the canonicalization step an
    // image/embedding dedup pipeline runs after pairing, exactly as
    // dd_cluster does for text. Components run on exact-vector group
    // REPRESENTATIVES only (twins share every band bucket and every
    // cosine, so a member's component is its rep's component); members
    // of eligible groups inherit the rep's cluster, zero-norm vectors
    // (cosine undefined — never pair, not even with their twins) are
    // singletons. Reuses connectedMinLabels round-for-round; the
    // oracle replays banding + verify and closes the components with a
    // recursive CTE, mirroring dd_cluster's.
    QueryDef(
      "dd_embed_cluster",
      (s, d) => {
        import s.implicits._
        embedMembership(s, d).orderBy($"vec_id")
      },
      Some(s"""WITH RECURSIVE $embedOracleCtes,
              eg AS (SELECT id_a AS src, id_b AS dst FROM upairs
                     UNION ALL SELECT id_b, id_a FROM upairs),
              reach AS (
                SELECT mn AS id, mn AS label FROM selfcos
                UNION
                SELECT eg.dst, r.label FROM reach r JOIN eg ON eg.src = r.id),
              repl AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id)
              SELECT g.vec_id, r.cluster
              FROM g JOIN selfcos sc ON sc.mn = g.mn JOIN repl r ON r.id = g.mn
              UNION ALL
              SELECT g.vec_id, g.vec_id AS cluster
              FROM g LEFT JOIN selfcos sn ON sn.mn = g.mn WHERE sn.mn IS NULL
              ORDER BY vec_id""")),

    // Semantic dedup APPLIED (SemDeDup's keep-one-per-cluster): the
    // survivor set is one representative per embedding near-dup
    // cluster — the cluster id itself, which IS the component-minimum
    // member — with the member count it stands for. Deterministic,
    // partitioning-independent, and a pure GROUP BY over the
    // dd_embed_cluster membership, so the oracle wraps the shared
    // recursive-CTE replay in one aggregate.
    QueryDef(
      "dd_embed_apply",
      (s, d) => {
        import s.implicits._
        embedMembership(s, d)
          .groupBy($"cluster")
          .agg(count(lit(1)).as("n_members"))
          .select($"cluster".as("vec_id"), $"n_members")
          .orderBy($"vec_id")
      },
      Some(s"""WITH RECURSIVE $embedOracleCtes,
              eg AS (SELECT id_a AS src, id_b AS dst FROM upairs
                     UNION ALL SELECT id_b, id_a FROM upairs),
              reach AS (
                SELECT mn AS id, mn AS label FROM selfcos
                UNION
                SELECT eg.dst, r.label FROM reach r JOIN eg ON eg.src = r.id),
              repl AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id),
              mem AS (
                SELECT g.vec_id, r.cluster
                FROM g JOIN selfcos sc ON sc.mn = g.mn JOIN repl r ON r.id = g.mn
                UNION ALL
                SELECT g.vec_id, g.vec_id AS cluster
                FROM g LEFT JOIN selfcos sn ON sn.mn = g.mn WHERE sn.mn IS NULL)
              SELECT cluster AS vec_id, CAST(count(*) AS BIGINT) AS n_members
              FROM mem GROUP BY cluster ORDER BY vec_id""")),

    // Embedding-space decontamination: scrub the training split of
    // vectors whose cosine to ANY benchmark-split vector reaches 0.4
    // — the semantic complement of dd_decontaminate (same held-out 20%
    // md5 id split, pure id arithmetic, so the split replays in the
    // oracle) for leakage n-gram minhash cannot see: a paraphrased
    // benchmark document shares no 3-grams but lands on a nearby
    // embedding. Asymmetric: benchmark side broadcast (guarded),
    // hyperplane band candidates, exact cosine verify, training
    // anti-join — see [[embedDecontaminate]].
    QueryDef(
      "dd_embed_decontaminate",
      (s, d) => {
        import s.implicits._
        val bucket = conv(substring(md5($"vec_id".cast("string")), 1, 4), 16, 10)
          .cast("int") % 100
        val all = table(s, d, "embeddings")
          .select($"vec_id", $"label", $"embedding",
            Similarity.asDouble($"embedding").as("v"))
          .withColumn("norm", Similarity.l2norm($"v"))
          .withColumn("vkey",
            graft.functions.VectorExpressions.floatVectorBytes($"embedding"))
          .withColumn("__bucket", bucket)
        val training = all.filter($"__bucket" >= 20).drop("__bucket")
        val benchmark = all.filter($"__bucket" < 20).drop("__bucket")
        embedDecontaminate(training, benchmark, "vec_id", 0.4)
          .select($"vec_id", $"label")
          .orderBy($"vec_id")
      },
      Some {
        val split = """(SELECT vec_id, embedding, label,
                        CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS bucket
                        FROM embeddings)"""
        s"""WITH tr AS (SELECT vec_id, embedding, label FROM $split WHERE bucket >= 20),
            bm AS (SELECT vec_id, embedding FROM $split WHERE bucket < 20),
            ${embedSideCtes("t_", "tr")},
            ${embedSideCtes("b_", "bm")},
            cand AS (
              SELECT DISTINCT a.vec_id AS tid, c.vec_id AS bid
              FROM t_b a JOIN b_b c ON len(list_intersect(a.bkts, c.bkts)) > 0),
            contam AS (
              SELECT DISTINCT cand.tid
              FROM cand
              JOIN t_e x ON x.vec_id = cand.tid
              JOIN b_e y ON y.vec_id = cand.bid
              WHERE x.nrm > 0 AND y.nrm > 0
                AND list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.4)
            SELECT t.vec_id, t.label
            FROM tr t JOIN t_g g ON g.vec_id = t.vec_id
            WHERE g.mn NOT IN (SELECT tid FROM contam)
            ORDER BY t.vec_id"""
      }),

    // Near-dup CLUSTERS: connected components over the verified
    // minhash pair graph, cluster id = minimum doc_id of the component
    // — the canonicalization step a training-data pipeline runs after
    // pairing (keep one doc per cluster, attribute the rest to it).
    // Components are computed on exact-content representatives only
    // (collapse proof as in dd_minhash_lsh: twins share every pair, so
    // a member's component is its rep's component); members of
    // eligible groups inherit the rep's cluster, gramless docs (never
    // pair) are singletons. The min-label loop is driver-CONTROLLED
    // but executor-run: one join+agg round per component-diameter hop
    // (see connectedMinLabels). The oracle replays the whole pipeline
    // — signatures, banding, verify, and the component fixpoint as a
    // recursive CTE (closure bounded by sum of component sizes
    // squared; components are near-dup cliques, so tiny).
    QueryDef(
      "dd_cluster",
      clusterQuery((v, e) => connectedMinLabels(v, e)),
      Some(clusterOracle)),

    // Same clusters via the star-contraction CC (the chain-robust
    // variant): labels are identical by construction — both converge
    // to component-minimum labels — so the ORACLE IS SHARED, and the
    // driver's hash-compare holds the two algorithms to bit-equality.
    QueryDef(
      "dd_cluster_star",
      clusterQuery((v, e) => connectedStarContraction(v, e)),
      Some(clusterOracle))
  )

  /** The dd_cluster pipeline body, parameterized by the connected-
    * components algorithm (min-label propagation or star contraction —
    * both return (id, label=component min)). */
  private def clusterQuery(cc: (DataFrame, DataFrame) => DataFrame)(
      s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = table(s, d, "documents")
    val grp = docs.withColumn("__min",
      min($"doc_id").over(Window.partitionBy(md5(lower($"text")))))
    val reps = grp.filter($"doc_id" === $"__min")
    val pairs = minhashNearDups(
        reps.select($"doc_id", $"text"), $"doc_id", $"text", 0.5)
      .select($"id_a", $"id_b")
    val repLabels = cc(reps.select($"doc_id".as("id")), pairs)
    val eligible = reps
      .filter(size(graft.functions.TextShingles.wordShingles($"text", 3)) > 0)
      .select($"doc_id".as("__min"))
    val members = grp.select($"doc_id", $"__min")
    val inherited = members
      .join(eligible, Seq("__min"))
      .join(repLabels.select($"id".as("__min"), $"label".as("cluster")), Seq("__min"))
      .select($"doc_id", $"cluster")
    val singletons = members.join(eligible, Seq("__min"), "left_anti")
      .select($"doc_id", $"doc_id".as("cluster"))
    inherited.unionByName(singletons).orderBy($"doc_id")
  }

  private lazy val clusterOracle: String = {
    val reps = """(SELECT doc_id, text FROM (
                    SELECT doc_id, text,
                           min(doc_id) OVER (PARTITION BY md5(lower(text))) AS mn
                    FROM documents) WHERE doc_id = mn)"""
    s"""${minhashOracleCtesFrom(reps).replaceFirst("WITH ", "WITH RECURSIVE ")},
        gm AS (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS mn
          FROM documents),
        up AS (SELECT id_a, id_b FROM verified WHERE sim >= 0.5),
        eg AS (SELECT id_a AS src, id_b AS dst FROM up
               UNION ALL SELECT id_b, id_a FROM up),
        reach AS (
          SELECT doc_id AS id, doc_id AS label FROM ne
          UNION
          SELECT eg.dst, r.label FROM reach r JOIN eg ON eg.src = r.id
        ),
        repl AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id)
        SELECT g.doc_id, r.cluster
        FROM gm g JOIN ne ON ne.doc_id = g.mn JOIN repl r ON r.id = g.mn
        UNION ALL
        SELECT g.doc_id, g.doc_id AS cluster
        FROM gm g LEFT JOIN ne ON ne.doc_id = g.mn WHERE ne.doc_id IS NULL
        ORDER BY doc_id"""
  }
}
