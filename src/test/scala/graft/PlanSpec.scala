package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the "would this survive 100×" gate.
  * Each check pins a plan property that matters at cluster scale:
  * filters/projections reaching the parquet scan, dimension joins
  * broadcasting (no fact-side shuffle), ranked queries planning a
  * single key shuffle, and pairwise operators never degenerating into
  * cartesian products. */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).length

  test("r1_filter_scan: predicate and projection pushed to parquet") {
    val p = plan("r1_filter_scan")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("o_totalprice"), p)
    // pruned read schema: no o_orderdate in the scan
    assert(!p.contains("ReadSchema") || !p.split("ReadSchema")(1).take(300).contains("o_orderdate"), p)
  }

  test("q1_agg: shipdate filter pushed down, partial aggregation present") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("partial_"), p) // map-side combine before the shuffle
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    for (q <- Seq("r3_fk_join", "q_brand_agg", "q3_topk_revenue")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
    }
  }

  test("q3_topk_revenue: top-K plans TakeOrderedAndProject, not a global sort") {
    assert(plan("q3_topk_revenue").contains("TakeOrderedAndProject"))
  }

  test("latest-per-key ranks inside one key shuffle") {
    val p = plan("d5_latest_per_key")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
    // exactly one exchange for the window partitioning (plus none after)
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("w_dedup_first: first-per-key ranks inside one key shuffle") {
    val p = plan("w_dedup_first")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("pairwise dedup operators never plan a cartesian product") {
    for (q <- Seq("dd_ngram_jaccard", "dd_minhash_lsh", "dd_simhash",
        "dd_embed_cos", "dd_embed_cluster", "dd_apply_lsh", "dd_apply")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("dd_decontaminate: blocklist side broadcasts, corpus never cartesians") {
    val p = plan("dd_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate join and the verify join both read the benchmark
    // side through a broadcast — the 100 TB corpus side streams
    assert(count(p, "BroadcastHashJoin") >= 2, p)
  }

  test("dd_embed_decontaminate: blocklist side broadcasts, corpus never cartesians") {
    val p = plan("dd_embed_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // band candidates, the verify join's benchmark side, and the final
    // anti-join all read the small side through a broadcast
    assert(count(p, "BroadcastHashJoin") >= 3, p)
  }

  test("t_rep_ngrams: shuffle-free column algebra — only the output sort exchanges") {
    val p = plan("t_rep_ngrams")
    // no aggregation, no join, no window: the ratios are per-row
    // expressions, so the ONLY exchange is the final orderBy's range
    // partitioning (plus AQE's reader)
    assert(count(p, "Exchange hash") == 0, p)
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
    assert(count(p, "Exchange range") == 1, p)
  }

  test("t_bm25: explode-free scoring, 1-row stats broadcast, top-K without a global sort") {
    val p = plan("t_bm25")
    // per-term tf is in-row counting — a per-gram postings explode
    // would show up as Generate
    assert(!p.contains("Generate"), p)
    // the one-row stats side joins back via broadcast (a nested-loop
    // join against a single-row build side is the right plan; there
    // is no key to hash on)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the only hash exchange is the global stats aggregate's
    assert(count(p, "Exchange hash") <= 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("w_neardup_pairs: one band-key exchange feeds the stateful index, no pair explosion joins") {
    for (q <- Seq("w_neardup_pairs", "w_embed_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      // batch execution of the online index: signatures/buckets are
      // in-row, so the only hash exchanges are the groupByKey(band)
      // and the final distinct — never a per-gram postings shuffle
      assert(p.contains("FlatMapGroupsWithState") || p.contains("MapGroups"), s"$q:\n$p")
      assert(count(p, "Exchange hash") <= 2, s"$q:\n$p")
    }
  }

  test("no operator sorts or exchanges on an interpreted lambda key (float-array normalization)") {
    // Keying a sort/shuffle on a raw array<float> makes
    // NormalizeFloatingNumbers wrap the key in an interpreted
    // transform(..., lambdafunction(...)) evaluated per COMPARISON
    // inside the generated ordering — measured turning dd_embed_cos's
    // exact-vector collapse into a single-task straggler at 10x.
    // FloatVectorBytes (a codegen'd binary fingerprint column) is the
    // sanctioned key shape; this pins every query to it.
    val sortKey = "(?m)^\\s*[+:*\\-() 0-9]*Sort \\[[^\\n]*lambdafunction".r
    val exchKey = "(?m)^\\s*[+:*\\-() 0-9]*Exchange hashpartitioning\\([^\\n]*lambdafunction".r
    for (q <- Seq("dd_embed_cos", "dd_embed_cluster", "dd_minhash_lsh",
        "dd_apply_lsh", "dd_cluster", "dd_cluster_star", "s_ann_lsh",
        "s_ann_ivf", "s_ann_bruteforce")) {
      val p = plan(q)
      assert(sortKey.findFirstIn(p).isEmpty, s"$q sorts on an interpreted lambda:\n$p")
      assert(exchKey.findFirstIn(p).isEmpty, s"$q shuffles on an interpreted lambda:\n$p")
    }
  }

  test("t_pack: prefix sum is bucketed two-phase — corpus never crosses a single-partition exchange") {
    val p = plan("t_pack")
    // the only SinglePartition structure is the BOUNDED bucket-offset
    // window (≈ rows / bucketWidth); the corpus-level prefix sum runs
    // partitioned by bucket, and the offsets join back by broadcast
    assert(count(p, "Exchange SinglePartition") == 1, p)
    assert(p.contains("Exchange hashpartitioning(__bucket"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t_dsir: selection rank is bucketed two-phase — corpus never crosses a single-partition window") {
    val p = plan("t_dsir")
    // the corpus-side row_number is PARTITIONED by the quantized-score
    // bucket (round 15 shipped this as an unpartitioned global window
    // — a single-task sort of the whole per-doc frame at 100 TB)
    assert(p.contains("windowspecdefinition(__sel_bucket"), p)
    assert(p.contains("Exchange hashpartitioning(__sel_bucket"), p)
    // SinglePartition exchanges only above AGGREGATED bounded frames:
    // the 1-row nr/nt totals (twice pre-AQE — exchange reuse collapses
    // it at runtime) and the ~32k-row bucket-offset table
    assert(count(p, "Exchange SinglePartition") <= 3, p)
    // the corpus count rides the broadcast bucket table — no third
    // scan, no extra cross join beyond lamFrame's 1-row totals frame
    // (which appears twice pre-AQE, once per consumer of the leased
    // feature frame, and collapses to a ReusedExchange at runtime)
    assert(count(p, "BroadcastNestedLoopJoin") <= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("t_pack_curriculum: quality-ordered prefix sum is bucketed two-phase") {
    val p = plan("t_pack_curriculum")
    // the corpus-side running sum is PARTITIONED by the quantized
    // quality bucket; only the bounded bucket-totals table crosses a
    // single-partition exchange
    assert(p.contains("windowspecdefinition(__sel_bucket"), p)
    assert(p.contains("Exchange hashpartitioning(__sel_bucket"), p)
    assert(count(p, "Exchange SinglePartition") <= 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("t_select_excess: one tokenize lease, both models from shared counts, bucketed selection") {
    val p = plan("t_select_excess")
    // selection rank partitioned by the quantized-excess bucket
    assert(p.contains("windowspecdefinition(__sel_bucket"), p)
    assert(p.contains("Exchange hashpartitioning(__sel_bucket"), p)
    // the leased tokenize pass feeds every consumer (no source re-read)
    assert(p.contains("Scan ExistingRDD"), p)
    // both count tables combine map-side before their shuffles
    assert(count(p, "partial_count") >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("t_sample_weighted: running weight sum is bucketed two-phase, boundary test in-row") {
    val p = plan("t_sample_weighted")
    // corpus-side running sum PARTITIONED by the hash-prefix bucket;
    // only the aggregated bucket table crosses a single partition
    assert(p.contains("windowspecdefinition(__sel_bucket"), p)
    assert(p.contains("Exchange hashpartitioning(__sel_bucket"), p)
    assert(count(p, "Exchange SinglePartition") <= 1, p)
    // offsets + grand total join back by broadcast; the leased
    // (doc_id, weight, hash) projection feeds both scans
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("t_batch_bylen: in-band rank is global-rank-minus-band-offset — no per-band corpus window") {
    val p = plan("t_batch_bylen")
    // the only corpus-sized window is partitioned by the (band, hash)
    // bucket; the band-offset table (<= maxBand+1 rows) and the bucket
    // table are the only SinglePartition structures
    assert(p.contains("windowspecdefinition(__sel_bucket"), p)
    assert(p.contains("Exchange hashpartitioning(__sel_bucket"), p)
    assert(count(p, "Exchange SinglePartition") <= 2, p)
    // a window PARTITIONED by len_band prints the bare column first
    // (no ASC) — the bounded band-offset table's window ORDERS by it
    assert(count(p, "windowspecdefinition\\(len_band#\\d+L,") == 0,
      s"per-band corpus window leaked into the plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("t_pack_split: t_pack's bucketed prefix sum + one in-row segment fan-out, no extra shuffle") {
    val p = plan("t_pack_split")
    // same bounded single-partition structure as t_pack (the bucket
    // offsets), the segment explosion is a Generate in the same stage
    assert(count(p, "Exchange SinglePartition") == 1, p)
    assert(p.contains("Generate explode"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("dd_cluster_keepbest: keeper argmax is one map-side-combined aggregate") {
    val p = plan("dd_cluster_keepbest")
    assert(p.contains("partial_min_by"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("t_classify_nb: count-model training + scoring all map-side-combined, argmin one aggregate") {
    val p = plan("t_classify_nb")
    // count tables and per-(doc, class) sums combine before shuffling
    assert(count(p, "partial_") >= 4, p)
    // the per-doc argmin is min_by, not a rank window
    assert(p.contains("partial_min_by"), p)
    assert(count(p, "Window") == 0, p)
    // broadcast nested-loop joins only against the bounded class /
    // totals frames (|classes| + 1 rows), never data x data: the
    // n_docs x vocab 1-row totals, prior x totals, tok x prior, and
    // the pre-AQE duplicates exchange reuse collapses at runtime
    assert(count(p, "BroadcastNestedLoopJoin") <= 5, p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // one tokenize lease feeds training and scoring
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q_rolling_range: RANGE frame ranks inside one key shuffle") {
    val p = plan("q_rolling_range")
    assert(p.contains("Window"), p)
    assert(count(p, "Exchange hashpartitioning") == 1, p)
  }

  test("t_sample_stratified: one aggregation, membership computed in the scan stage") {
    val p = plan("t_sample_stratified")
    assert(p.contains("partial_"), p) // map-side combine before the shuffle
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("dd_embed_cos: candidate join is keyed on the hyperplane band bucket") {
    // the former label blocking was all-pairs within a fixed bucket
    // set (O(N^2/L)); the join key must be the LSH band bucket
    val p = plan("dd_embed_cos")
    assert("""(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[bkt""".r
      .findFirstIn(p).isDefined, p)
  }

  test("dd_ngram_jaccard: candidates are prefix-filtered and band-keyed") {
    // the pre-round-4 form joined FULL posting lists on the gram —
    // Σ adjacent-band df(gram)², unbounded under a hot gram; the
    // prefix filter indexes only the df-ASC prefix (rank predicate)
    // and the band adjacency must ride the equi-join key
    val p = plan("dd_ngram_jaccard")
    assert(p.contains("row_number"), p)
    assert("""(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin) \[x#""".r
      .findFirstIn(p).isDefined, p)
  }

  test("dd_ngram_jaccard: postings + array exchanges are reused, verify never explodes per gram") {
    // two pins: (1) the prefix-postings window exchange feeds BOTH
    // candidate-join sides and the doc-array relation feeds BOTH
    // verify joins from one exchange each (ReuseExchange, finalized by
    // AQE at runtime — execute first); (2) the verify stage joins
    // candidate PAIRS on doc ids only — a join keyed on the gram
    // column x beyond the candidate join would be the 13M-row
    // pair-x-posting explosion this plan replaced
    val df = SparkEntry.queries("dd_ngram_jaccard")(spark, sf)
    df.collect()
    // AdaptiveSparkPlan.toString prints the final plan FOLLOWED by the
    // initial plan — count joins only in the final section
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(count(p, "ReusedExchange") >= 3, p)
    assert(count(p, """(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin) \[x#""") <= 1, p)
  }

  test("dd_apply: one postings shuffle serves prefix + both verify sides") {
    // the collapse group/eligible frames are leased (round-17), so the
    // heavy sharing is materialized-once localCheckpoint blocks — the
    // final plan reads ExistingRDD scans — and prefixCandidates'
    // postings aggregate still rides ReuseExchange across its
    // remaining consumers (AQE finalizes reuse at runtime, so execute
    // first)
    val df = SparkEntry.queries("dd_apply")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Scan ExistingRDD"), p)
    assert(count(p, "ReusedExchange") >= 1, p)
  }

  test("q_json_extract: JSON parsed exactly once per row") {
    // a filter on the projected alias would be pushed below the project
    // with the parse tree substituted into it (two eval sites in
    // codegen); the explode barrier must keep it to one
    val optimized = SparkEntry.queries("q_json_extract")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(count(optimized, "get_json_object") == 1, optimized)
  }

  test("ANN brute force: corpus scanned once, queries broadcast") {
    val p = plan("s_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("s_ann_adc: code pass broadcasts queries; re-rank joins are hash joins, never a second pair scan") {
    val p = plan("s_ann_adc")
    // the ADC scan is the one intended broadcast fan-out (tiny query
    // side); the float re-rank must come back as equi-joins on ids —
    // a second nested-loop would be a second full pair enumeration
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, p)
    assert(count(p, "BroadcastHashJoin") >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s_ann_ivfpq: one-shot composed index build, cell-keyed ADC join, hash-join re-ranks, no cartesian") {
    val p = plan("s_ann_ivfpq")
    // neither training subtree (4 k-means rounds + 4 per-subspace PQ
    // rounds — a dozen-plus posexplode aggregates if inlined, round
    // 8's failure mode) may appear in the serving plan: the lease
    // materializes the joined index once, and the ONLY legitimate
    // posexplode is the serving-centroid recompute over that
    // materialized index. The centroid probe is the one intended
    // nested-loop (queries x nlist, both broadcast-tiny).
    assert(count(p, "posexplode") <= 3, p)
    assert(count(p, "BroadcastNestedLoopJoin") <= 2, p)
    assert(count(p, "BroadcastHashJoin") >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s_ann_ivfpq_res: nested trainings stay out of serving — leased index + centroids, no posexplode at all") {
    val p = plan("s_ann_ivfpq_res")
    // the residual variant leases the composed index AND the nlist-row
    // centroid table, so the serving plan carries NO posexplode — the
    // centroid recompute the non-residual plan tolerates is behind the
    // lease here (its blocks feed residual training, v̂ join, probe)
    assert(count(p, "posexplode") == 0, p)
    assert(count(p, "BroadcastNestedLoopJoin") <= 2, p)
    assert(count(p, "BroadcastHashJoin") >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s_ann_ivf_add: the add path is one broadcast map — no retraining subtree, no posexplode in serving") {
    val p = plan("s_ann_ivf_add")
    // trained base index AND centroid table lease (Scan ExistingRDD);
    // the increment assignment + the probe are the two intended
    // broadcast-tiny nested loops; nothing iterative reaches serving
    assert(p.contains("Scan ExistingRDD"), p)
    assert(count(p, "posexplode") == 0, p)
    assert(count(p, "BroadcastNestedLoopJoin") <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    // the union index feeds one cell equi-join (the probed-postings scan)
    assert(p.contains("Union"), p)
  }

  test("s_ann_ivf_del: remove_ids is one broadcast anti-join over the union index — no rebuild") {
    val p = plan("s_ann_ivf_del")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(count(p, "posexplode") == 0, p)
    // the tombstone anti-join rides broadcast (tiny id set), on top of
    // the family's two intended broadcast-tiny nested loops
    assert(p.contains("LeftAnti"), p)
    assert(count(p, "BroadcastNestedLoopJoin") <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Union"), p)
  }

  test("s_ann_ivf_stored: serving lineage is pure parquet — no lease, no training subtree survives the round-trip") {
    val p = plan("s_ann_ivf_stored")
    // the reloaded index is a plain FileScan: unlike s_ann_ivf_add,
    // NOT EVEN the lease (Scan ExistingRDD) reaches the serving plan —
    // training happened "in another job" as far as this plan knows
    assert(!p.contains("Scan ExistingRDD"), p)
    assert(p.contains("Scan parquet"), p)
    assert(count(p, "posexplode") == 0, p)
    assert(count(p, "BroadcastNestedLoopJoin") <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Union"), p)
  }

  test("s_hard_negatives_stored: mining lineage is pure parquet — no lease, no training subtree, no centroid recompute") {
    val p = plan("s_hard_negatives_stored")
    // both artifacts (labeled index + serving centroids) reload as
    // plain FileScans; the posexplode-based centroid recompute ran in
    // the build job, not here
    assert(!p.contains("Scan ExistingRDD"), p)
    assert(p.contains("Scan parquet"), p)
    assert(count(p, "posexplode") == 0, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s_ann_ivfpq_add: quantized add serves from the leased union index — no training subtree, no posexplode") {
    val p = plan("s_ann_ivfpq_add")
    // both iterative trainings AND the three-broadcast add path sit
    // behind the index lease (Scan ExistingRDD); serving is probe +
    // cell equi-join + id-equi-join re-ranks over materialized frames
    assert(p.contains("Scan ExistingRDD"), p)
    assert(count(p, "posexplode") == 0, p)
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, p)
    assert(count(p, "BroadcastHashJoin") >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_mix_rebalance: one leased tokenize pass, broadcast rate join, two source-keyed aggregates") {
    val p = plan("t_mix_rebalance")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    assert(p.contains("Scan ExistingRDD"), p) // leased tokenize projection
    // the 1-row min crossJoin is the one intended nested loop; the
    // rate table joins back broadcast (no corpus shuffle for the keep)
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_"), p) // map-side combine on both aggregates
  }

  test("dd_lsh_increment: frozen-index admission — leased sides, banded equi-joins, one anti-join, no windows") {
    val p = plan("dd_lsh_increment")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // both signature sides lease (the corpus one IS the stored day-1
    // index); candidates come from band equi-joins only
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("LeftAnti"), p)
    assert(count(p, "Window \\[") == 0, p)
  }

  test("dd_embed_increment: frozen-index admission — leased sides, bucket equi-joins, one anti-join, no windows") {
    val p = plan("dd_embed_increment")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("LeftAnti"), p)
    assert(count(p, "Window \\[") == 0, p)
  }

  test("dd_lsh_stored: the reloaded corpus index reaches admission as a plain parquet scan") {
    val p = plan("dd_lsh_stored")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // corpus side: reloaded parquet frames (no lease, no lineage back
    // to the corpus text); batch side: the usual lease
    assert(p.contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("LeftAnti"), p)
    assert(count(p, "Window \\[") == 0, p)
  }

  test("dd_embed_stored: the reloaded vector index reaches admission as a plain parquet scan") {
    val p = plan("dd_embed_stored")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    assert(p.contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("LeftAnti"), p)
    assert(count(p, "Window \\[") == 0, p)
  }

  test("s_ann_ivfpq_stored: the quantized round-trip serves exactly like the leased add — no training subtree, no posexplode") {
    val p = plan("s_ann_ivfpq_stored")
    // the union index leases either way (serving reads it three
    // times); the STRUCTURAL reloaded-artifact claim — parquet-only
    // lineage for all four frames — is pinned by IndexStoreSpec on
    // the frames themselves, which the union lease would hide here
    assert(p.contains("Scan ExistingRDD"), p)
    assert(count(p, "posexplode") == 0, p)
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, p)
    assert(count(p, "BroadcastHashJoin") >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s_hard_negatives: the s_ann_ivf serving shape + a scan-side label exclusion, nothing new pairwise") {
    val p = plan("s_hard_negatives")
    assert(p.contains("Scan ExistingRDD"), p) // leased one-shot index
    // the centroid recompute over the leased index is the one
    // posexplode; the probe is the one broadcast-tiny nested loop
    assert(count(p, "posexplode") <= 1, p)
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    // the label exclusion rides the candidate join, not a post-rank
    // filter: no window operator beyond probe rk + top-k rank (the
    // escaped bracket keeps WindowGroupLimit rows out of the count)
    assert(count(p, "Window \\[") <= 2, p)
  }

  test("s_ann_pq: one-shot index build (checkpoint truncates training), hash-join re-ranks, no cartesian") {
    val p = plan("s_ann_pq")
    // the ADC scan over the checkpointed reconstruction index is the
    // one intended broadcast fan-out; the 4-round training subtree
    // must NOT appear in the serving plan (the lease materializes it
    // once — a recurrence of round 8's IVF inline-training blowup
    // would put posexplode aggregates here), and the float re-rank
    // comes back as id equi-joins
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, p)
    assert(count(p, "BroadcastHashJoin") >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Generate posexplode"), p)
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
  }

  test("s_ann_ivf_adc: cell-bounded code scan, hash-join re-ranks, no cartesian anywhere") {
    val p = plan("s_ann_ivf_adc")
    // the centroid probe is the one intended nested-loop (queries x
    // nlist centroids, both broadcast-tiny); the cell scan and both
    // re-rank fetches must be equi-joins
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, p)
    assert(count(p, "BroadcastHashJoin") >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dd_dup_ngrams: postings shuffle on the 8-byte gram hash with map-side combine, no pair join") {
    val p = plan("dd_dup_ngrams")
    // counts aggregate partially before the exchange (viral grams
    // cannot flood one reducer with raw postings)...
    assert(p.contains("partial_"), p)
    // ...the shuffle key is the hash h, never the gram string...
    assert(p.contains("Exchange hashpartitioning(h#"), p)
    assert(!p.contains("Exchange hashpartitioning(__gram"), p)
    // ...and nothing is pairwise
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dd_containment: prefix-vs-full-index equi-join on the gram hash, verify by id joins, no cartesian") {
    val p = plan("dd_containment")
    // the candidate join must key on the gram hash x (prefix postings
    // against the full index), never enumerate pairs
    assert("""(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin) \[x#""".r
      .findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // verify joins move candidate PAIRS against one array row per doc
    assert(count(p, """(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin) \[id_""") >= 2, p)
  }

  test("dd_dup_spans: hash-keyed postings, one doc-keyed window, nothing pairwise") {
    val p = plan("dd_dup_spans")
    assert(p.contains("partial_"), p) // df counts combine map-side
    assert(p.contains("Exchange hashpartitioning(h#"), p)
    assert(p.contains("row_number"), p) // the islands window
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t_chunk: per-row fan-out only — no hash exchange anywhere in the plan") {
    val p = plan("t_chunk")
    assert(p.contains("Generate"), p) // the posexplode fan-out
    assert(count(p, "Exchange hashpartitioning") == 0, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_tokenize: BPE is per-row compiled compute — no hash exchange, no UDF, ONE tokenizer call per row") {
    val p = plan("t_tokenize")
    // only the presentation orderBy ranges; the compute is map-only
    assert(count(p, "Exchange hashpartitioning") == 0, p)
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
    // count and md5 both derive from the one joined token stream
    assert(count(p, "bpetokens") == 1, p)
  }

  test("t_chunk_bpe: same fan-out shape as t_chunk — no hash exchange") {
    val p = plan("t_chunk_bpe")
    assert(p.contains("Generate"), p)
    assert(count(p, "Exchange hashpartitioning") == 0, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_pack_bpe: bucketed two-phase prefix sum like t_pack") {
    val p = plan("t_pack_bpe")
    assert(count(p, "Exchange SinglePartition") == 1, p)
    assert(p.contains("Exchange hashpartitioning(__bucket"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pipe_corpus: composition has no plan pathologies — no cartesian, no UDF, TWO bounded single-partition exchanges") {
    val p = plan("pipe_corpus")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // the only SinglePartition structures are the pack stage's bucket-
    // offset window (rows / bucketWidth) and the LM gate's 1-row vocab
    // scalar aggregate (which needs no exchange at all when the leased
    // unigram table materializes as one partition — hence 1 OR 2);
    // every other stage keeps the banded equi-join / broadcast shapes
    // its standalone query gates
    val sp = count(p, "Exchange SinglePartition")
    assert(sp >= 1 && sp <= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pipe_curate: composition has no plan pathologies — no cartesian, no UDF, bounded single-partition exchanges, leased boundaries") {
    val p = plan("pipe_curate")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // selection/cluster stages sit behind localCheckpoint leases, so
    // the final plan starts from truncated ExistingRDD scans and
    // carries only the sample-join + batching + packing stages
    assert(p.contains("Scan ExistingRDD"), p)
    // the only SinglePartition structures are the bounded bucket/band
    // tables: the batching global-rank bucket window, its ≤ 17-row
    // band-offset window, and the packing prefix-sum bucket window
    val sp = count(p, "Exchange SinglePartition")
    assert(sp >= 1 && sp <= 4, s"$sp single-partition exchanges\n$p")
    // every corpus-sized rank rides the bucketed two-phase plan
    assert(p.contains("Exchange hashpartitioning(__sel_bucket") ||
      p.contains("__sel_bucket"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pipe_media: staged composition — leased boundaries, anti-join survivors, no cartesian, no UDF") {
    val p = plan("pipe_media")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // the image/audio stages sit behind localCheckpoint leases, so the
    // final plan starts from a truncated ExistingRDD scan — the lease
    // evidence — and carries only the video stage + feature extraction
    assert(p.contains("Scan ExistingRDD"), p)
    // video-stage survivors leave by one anti-join, never pairwise
    assert(p.contains("LeftAnti"), p)
    // the video twin-collapse min runs once inside the stage's
    // collapse lease (round-17: collapseApplySurvivors leases its
    // grouped frame), so the final plan carries at most bounded
    // re-instantiations — typically zero
    val w = count(p, "Window")
    assert(w <= 4, s"$w windows\n$p")
    // features run through the typed per-partition codec path
    assert(p.contains("MapPartitions"), p)
  }

  test("t_pii_redact: pure per-row column algebra — no hash exchange, no UDF") {
    val p = plan("t_pii_redact")
    assert(count(p, "Exchange hashpartitioning") == 0, p)
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
  }

  test("mm_phash_pairs: leased hash projection, banded equi-join candidates, nothing pairwise") {
    for (q <- Seq("mm_phash_pairs", "mm_audio_pairs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), s"$q:\n$p")
      // the hashed projection is leased — the media payload is scanned
      // once, not once per consumer
      assert(p.contains("Scan ExistingRDD"), s"$q:\n$p")
      assert(count(p, "Window") == 0, s"$q:\n$p")
    }
  }

  test("mm_apply_phash / mm_apply_audio / mm_apply_video: collapse window + pair evidence + anti-join, nothing pairwise") {
    for (q <- Seq("mm_apply_phash", "mm_apply_audio", "mm_apply_video")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), s"$q:\n$p")
      // the twin-collapse window runs ONCE inside the localCheckpoint
      // lease (round-17: collapseApplySurvivors leases its grouped and
      // eligible-rep frames, so the window no longer re-instantiates
      // per consumer) — the final plan reads materialized ExistingRDD
      // scans; the survivor set leaves by one anti-join, never a
      // pairwise subtraction
      assert(p.contains("Scan ExistingRDD"), s"$q:\n$p")
      val w = count(p, "Window")
      assert(w <= 4, s"$q: $w windows\n$p")
      assert(p.contains("LeftAnti"), s"$q:\n$p")
    }
  }

  test("mm_video_pairs: frame-hash postings equi-join, pair counts aggregate with map-side combine") {
    val p = plan("mm_video_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    assert(p.contains("partial_count"), p)
    assert(count(p, "Window") == 0, p)
  }

  test("mm_video_pairs_phash: leased frame fingerprints, banded candidates, distinct-count aggregate") {
    val p = plan("mm_video_pairs_phash")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // per-frame fingerprint projection is leased — the media payload
    // is scanned once across postings, both candidate sides and sizes
    assert(p.contains("Scan ExistingRDD"), p)
    // n_shared = countDistinct plans as a two-phase aggregate, and no
    // window function appears anywhere in the pair pipeline
    assert(count(p, "Window") == 0, p)
  }

  test("w_audio: one band-key exchange feeds the stateful audio index") {
    val p = plan("w_audio")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("FlatMapGroupsWithState") || p.contains("MapGroups"), p)
  }

  test("w_video: one frame-hash-key exchange feeds the stateful video index") {
    val p = plan("w_video")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("FlatMapGroupsWithState") || p.contains("MapGroups"), p)
  }

  test("w_media: ONE unified band-key exchange judges all three kinds, survivors by anti-join") {
    val p = plan("w_media")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("FlatMapGroupsWithState") || p.contains("MapGroups"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("w_corpus: stateless gate chain + one stateful band exchange, no cartesian") {
    val p = plan("w_corpus")
    assert(!p.contains("CartesianProduct"), p)
    // the gated relation is leased across its three consumers
    assert(p.contains("Scan ExistingRDD"), p)
    // the band-keyed index op (flatMapGroupsWithState executes as
    // MapGroups under batch)
    assert(p.contains("MapGroups"), p)
  }

  test("w_corpus_nb: stateless classifier gate + one stateful band exchange, no cartesian, no UDF") {
    val p = plan("w_corpus_nb")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // the gated + admitted relations are leased across their fan-outs
    assert(p.contains("Scan ExistingRDD"), p)
    // the frozen-model scorer is the per-partition broadcast map, and
    // the band-keyed index op executes as MapGroups under batch
    assert(p.contains("MapGroups") || p.contains("MapPartitions"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("w_curate: frozen-threshold gate + stateful index/batcher, bucketed rank, no cartesian, no UDF") {
    val p = plan("w_curate")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // scored corpus / admitted / survivor relations ride leases
    assert(p.contains("Scan ExistingRDD"), p)
    // the online batcher's per-band counters (flatMapGroupsWithState
    // under batch) — state-keyed, never a corpus window
    assert(p.contains("MapGroups") || p.contains("FlatMapGroupsWithState"), p)
  }

  test("t_select_bydomain: grouped two-phase rank — NO single-partition structure anywhere") {
    val p = plan("t_select_bydomain")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // the grouped primitive's whole point: even the bucket-offsets
    // window is partitioned (by source), so nothing in the plan ever
    // collapses to one partition
    assert(count(p, "Exchange SinglePartition") == 0, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("w_select_bydomain: grouped threshold build + broadcast artifact join, no single-partition structure") {
    val p = plan("w_select_bydomain")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    assert(count(p, "Exchange SinglePartition") == 0, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t_mix_budget: grouped prefix sums + one bounded budget aggregate, no cartesian, no UDF") {
    val p = plan("t_mix_budget")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // the only single-partition structure is the |sources|-row budget
    // min; the per-domain running sums ride the grouped bucket plan
    assert(count(p, "Exchange SinglePartition") <= 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p) // leased tokenize
  }

  test("w_mix_rebalance / w_mix_classified: frozen broadcast rates, no cartesian, no UDF") {
    for (q <- Seq("w_mix_rebalance", "w_mix_classified")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), s"$q:\n$p")
      // admission joins the broadcast rates frame; the arrival map is
      // per-row column algebra (plus the NB scorer's partition map in
      // the classified form)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$q:\n$p")
      assert(p.contains("Scan ExistingRDD"), s"$q:\n$p") // leased tokenize
    }
  }

  test("t_pack_shuffled: bucketed two-phase prefix sum, bounded single-partition structure") {
    val p = plan("t_pack_shuffled")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // the only global structure is the bucket-offset window over
    // hash-high-bit bucket TOTALS, never rows
    assert(count(p, "Exchange SinglePartition") == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dd_apply_spans: hash-keyed canonical agg (no per-gram window), leased fan-out, nothing pairwise") {
    val p = plan("dd_apply_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // canonical selection is min(struct) with map-side partials — a
    // window partitioned by gram hash would serialize viral grams
    assert(count(p, "Window") == 0, p)
    assert(p.contains("partial_min"), p)
    // the tokenize pass is leased, not re-derived per consumer
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("t_lm_score: leased fan-out, keyed model joins, ONE bounded scalar exchange") {
    val p = plan("t_lm_score")
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
    // the tokenized corpus is leased (LogicalRDD scans), so training is
    // NOT re-derived from the source per consumer
    assert(p.contains("Scan ExistingRDD"), p)
    // both count tables combine map-side before their shuffle
    assert(count(p, "partial_count") >= 2, p)
    // key-hash exchanges: bigram-count agg + final doc agg, nothing else
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
    // the only single-partition structure is the 1-row vocabulary scalar
    assert(count(p, "Exchange SinglePartition") == 1, p)
  }

  test("t_mix_sample: group rates broadcast back, membership filtered map-side") {
    val p = plan("t_mix_sample")
    // per-group counts come back as a broadcast (group count, not rows)
    assert(p.contains("BroadcastHashJoin"), p)
    // the kept rollup combines map-side
    assert(p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("whole-stage codegen covers the scan->project hot path (no UDFs)") {
    for (q <- Seq("q1_agg", "d3_decode", "d4_conversion", "t_text_stats")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(codegen.contains("WholeStageCodegen"), s"$q:\n${codegen.take(500)}")
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), s"$q:\n$p")
    }
  }
}
