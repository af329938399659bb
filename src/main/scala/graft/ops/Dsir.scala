package graft.ops

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169; PAPERS.md): select raw-pool documents whose
  * hashed-n-gram distribution resembles a TARGET domain. Each document
  * is a bag of hashed features (word unigrams + bigrams, md5-portable
  * hash mod `buckets`); two add-one-smoothed feature models are
  * counted — target (here: the `lang = 'en'` slice, the pool's
  * dominant quality domain) and raw (the whole pool) — and a
  * document's importance weight is the sum over its feature
  * OCCURRENCES of the per-feature log-likelihood ratio
  * `log p_target(f) - log p_raw(f)`. The top `topFrac` by
  * length-normalized weight (avg bits/feature, doc_id tie-break) are
  * flagged selected.
  *
  * Cross-engine exactness — the [[LmScore]] move, generalized to
  * SIGNED ratios: no float `ln()` anywhere. The per-feature ratio is
  * the exact rational `num/den = (c_t(f)+1)(N_r+B) / ((c_r(f)+1)(N_t+B))`
  * and the weight is quantized to INTEGER bits `floor(log2(num/den))`,
  * computed purely in integer arithmetic: candidate k0 =
  * bitlen(num) - bitlen(den) (which is negative when the ratio is
  * < 1 — raw-typical features), corrected by one exact shift-compare
  * on whichever side the shift stays left (`den << k0 <= num` for
  * k0 >= 0, `num << -k0 >= den` below). DuckDB replays every step
  * bit-for-bit. The long products hold while the total feature count
  * plus `buckets` stays under 2^31 (then num, den < 2^62) — ENFORCED
  * loudly, both in the plan ([[lamFrame]]'s assert_true guard) and at
  * model-collect time ([[buildDsirModel]]'s require); a 100 TB
  * deployment right-shifts BOTH counts by a common power of two
  * first — same decision variable on a coarser grid, same machinery.
  *
  * Scale shape (100 TB): the hashed-feature frame is leased once and
  * fans out to the raw counts, the target counts, and the scoring
  * join. Both model tables are B rows — bounded by the hash-bucket
  * count, NOT the corpus — so the per-feature ratio table broadcasts,
  * and scoring is one map-side-combined aggregate over the feature
  * stream. Selection — the one corpus-wide rank the operator needs —
  * rides [[Selection.topFracByOrder]]'s two-phase bucketed plan: the
  * only globally-ordered structure is the ~32k-row bucket-totals
  * table, never a single-partition sort of the per-doc frame.
  */
object Dsir {

  import TextAnalysis.tokens

  /** All hashed feature codes of one document as ONE array (unigram
    * codes then bigram codes — order irrelevant, every consumer
    * aggregates). Computed INSIDE the feature lease so the per-token
    * md5 runs exactly once per occurrence (round 17's Classify move);
    * the round-17 shape here leased the TOKENIZED corpus first and
    * built the exploded feature frame as a second lease reading those
    * blocks twice (unigram + bigram union branches) — two sequential
    * corpus-scale materialization jobs where the array form needs one
    * (guide §1.2/§2.3: one pass, one job, and the array lease holds
    * ~docs rows instead of the ~2×token-occurrence exploded frame).
    * Consumers explode the leased array — codes are precomputed, so
    * the explode is pure row fan-out. */
  private def featCodes(toks: Column, buckets: Int): Column = {
    val h = graft.functions.PortableHash.md5Hash60(_: Column)
    val uni = transform(toks, w => pmod(h(w), lit(buckets.toLong)))
    val m = greatest(size(toks) - 1, lit(0))
    val bg = zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => pmod(h(concat_ws(" ", a, b)), lit(buckets.toLong)))
    concat(uni, bg)
  }

  /** Lease the per-doc feature-code arrays and return the exploded
    * (doc_id, is_target, f) frame every consumer aggregates —
    * value-identical to the round-17 exploded lease (same multiset of
    * rows: explode ∘ concat(map(h), zipmap(h)) == union of the mapped
    * explodes; row order never mattered). */
  private def leasedFeats(
      docs: DataFrame, docId: Column, isTarget: Column, text: Column,
      buckets: Int, tag: String): DataFrame = {
    import docs.sparkSession.implicits._
    val arr = Checkpoints.lease(tag, docs.select(docId.as("doc_id"),
      isTarget.as("is_target"), featCodes(tokens(text), buckets).as("fs")))
    arr.select($"doc_id", $"is_target", explode($"fs").as("f"))
  }

  /** The per-bucket ratio table — B rows, bucket-bounded, broadcast by
    * every consumer. The signed integer-bit log ratio: candidate
    * k0 = bitlen(num) - bitlen(den) (negative for raw-typical
    * features), corrected by one exact shift-compare on whichever
    * side the shift stays left. */
  private def lamFrame(featsL: DataFrame, buckets: Int): DataFrame = {
    import featsL.sparkSession.implicits._
    val cr = featsL.groupBy($"f").agg(count(lit(1)).as("crn"))
    val ct = featsL.filter($"is_target").groupBy($"f").agg(count(lit(1)).as("ctn"))
    val tot = featsL.agg(
      count(lit(1)).as("nr"),
      sum(when($"is_target", 1L).otherwise(0L)).as("nt"))
    // loud overflow guard, IN the plan so column pruning can't drop
    // it: the long products are exact only while nr + B < 2^31 (then
    // num <= (nt+1)(nr+B) < 2^62 and den likewise, since ctn <= nt <=
    // nr and crn <= nr). assert_true returns NULL when the bound
    // holds, so the `when` below is the identity — and a corpus past
    // the bound fails HERE with the documented mitigation instead of
    // silently wrapping.
    val guard = assert_true($"nr" + lit(buckets.toLong) < lit(1L << 31),
      lit("DSIR ratio table: total feature count + buckets >= 2^31 — the " +
        "exact long products would overflow; right-shift both counts by a " +
        "common power of two first (same decision variable on a coarser " +
        "grid) or raise the quantization grid"))
    cr.join(ct, Seq("f"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("num", when(guard.isNull,
        (coalesce($"ctn", lit(0L)) + 1L) * ($"nr" + lit(buckets.toLong))))
      .withColumn("den", ($"crn" + 1L) * ($"nt" + lit(buckets.toLong)))
      .withColumn("k0", length(bin($"num")) - length(bin($"den")))
      .withColumn("lam",
        when($"k0" >= 0,
          when(expr("shiftleft(den, k0)") <= $"num", $"k0").otherwise($"k0" - 1))
          .otherwise(
            when(expr("shiftleft(num, -k0)") >= $"den", $"k0").otherwise($"k0" - 1))
          .cast("long"))
      .select($"f", $"lam")
  }

  /** Per-document DSIR weights + selection flag. Output:
    * (doc_id, n_feats, dsir_sum_bits, dsir_avg_bits, selected) for
    * every document with at least one token. */
  def dsirWeights(
      docs: DataFrame, docId: Column, text: Column, isTarget: Column,
      buckets: Int = 256, topFrac: Double = 0.25): DataFrame = {
    import docs.sparkSession.implicits._
    val featsL = leasedFeats(docs, docId, isTarget, text, buckets, "dsir_feats")
    val perDoc = featsL.join(broadcast(lamFrame(featsL, buckets)), Seq("f"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum($"lam").cast("long").as("dsir_sum_bits"))
      .withColumn("dsir_avg_bits",
        $"dsir_sum_bits".cast("double") / $"n_feats")
    // top-fraction selection via the bucketed two-phase rank
    // ([[Selection.topFracByOrder]]) — NOT an unpartitioned window.
    // The bucket is the avg quantized to 1/256 bit, negated for the
    // descending order: per-feature bits satisfy |lam| <= 63, so the
    // bucket table holds at most ~2 * 63 * 256 ≈ 32k totals no matter
    // the corpus size, and floor() is monotone in -avg, so earlier
    // (higher-avg) rows never land in a later bucket.
    Selection.topFracByOrder(perDoc,
      floor(-$"dsir_avg_bits" * lit(256.0)),
      Seq($"dsir_avg_bits".desc, $"doc_id".asc), topFrac, "selected")
      .select($"doc_id", $"n_feats", $"dsir_sum_bits", $"dsir_avg_bits", $"selected")
  }

  /** The broadcast DSIR model: per-bucket integer-bit log ratios plus
    * the smoothing-only default for buckets no corpus feature hashed
    * into (an out-of-corpus arrival can still produce them). B
    * entries — bounded by the hash-bucket count, never the corpus. */
  case class DsirModel(lam: java.util.HashMap[Long, Long], default: Long,
    buckets: Int) extends Serializable

  /** Collect the per-bucket ratio table into a [[DsirModel]] behind a
    * loud cap (the frame is `buckets` rows by construction; a
    * mis-wired corpus-sized frame must fail here, not OOM the
    * driver). */
  def buildDsirModel(
      docs: DataFrame, docId: Column, text: Column, isTarget: Column,
      buckets: Int = 256, maxEntries: Long = 1L << 22): DsirModel = {
    import docs.sparkSession.implicits._
    val featsL = leasedFeats(docs, docId, isTarget, text, buckets,
      "dsir_model_feats")
    val lamDf = lamFrame(featsL, buckets)
    val n = lamDf.agg(count(lit(1))).head().getLong(0)
    require(n <= maxEntries,
      s"DSIR ratio table holds $n entries (> $maxEntries) — that is not " +
        "a hash-bucketed model; lower `buckets`")
    val m = new java.util.HashMap[Long, Long]()
    lamDf.collect().foreach(r => m.put(r.getLong(0), r.getLong(1)))
    val tot = featsL.agg(count(lit(1)).as("nr"),
      sum(when($"is_target", 1L).otherwise(0L)).as("nt")).head()
    val (nr, nt) = (tot.getLong(0), tot.getLong(1))
    require(nr + buckets < (1L << 31),
      s"DSIR model: total feature count $nr + $buckets buckets >= 2^31 — " +
        "the exact long products would overflow; right-shift both counts " +
        "by a common power of two first (same decision variable on a " +
        "coarser grid)")
    // default = both counts zero under the same smoothing
    def floorLog2(num: Long, den: Long): Long = {
      var k0 = (63 - java.lang.Long.numberOfLeadingZeros(num)) -
        (63 - java.lang.Long.numberOfLeadingZeros(den))
      val ok = if (k0 >= 0) (den << k0) <= num else (num << -k0) >= den
      if (ok) k0 else k0 - 1
    }
    DsirModel(m, floorLog2(nr + buckets, nt + buckets), buckets)
  }

  /** Score each row of a batch OR streaming frame against the frozen
    * broadcast model: tokenize, hash unigrams + bigrams with the
    * portable JVM hash twin ([[graft.functions.PortableHash
    * .md5Hash60Jvm]] — bit-identical to the column expression and the
    * oracle), sum the per-bucket bits. Documents with no tokens emit
    * nothing. Stateless map, batch == stream — the DSIR twin of
    * [[graft.streaming.LmServe.withOnlineLmScore]]. */
  def withOnlineDsirScore(
      docs: DataFrame, id: Column, text: Column, model: DsirModel): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val bModel = docs.sparkSession.sparkContext.broadcast(model)
    val prepped = docs.select(id.as("__id"), tokens(text).as("__toks"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_feats", LongType, nullable = false),
      StructField("dsir_sum_bits", LongType, nullable = false),
      StructField("dsir_avg_bits", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    prepped.mapPartitions { rows =>
      val m = bModel.value
      val b = m.buckets.toLong
      def lamOf(s: String): Long = {
        val f = graft.functions.PortableHash.md5Hash60Jvm(s) % b
        m.lam.getOrDefault(f, m.default)
      }
      rows.flatMap { r =>
        val did = r.getLong(0)
        val toks = r.getSeq[String](1)
        if (toks.isEmpty) Iterator.empty
        else {
          var sum = 0L
          var n = 0L
          var i = 0
          while (i < toks.length) {
            sum += lamOf(toks(i)); n += 1
            if (i > 0) { sum += lamOf(toks(i - 1) + " " + toks(i)); n += 1 }
            i += 1
          }
          Iterator.single(Row(did, n, sum, sum.toDouble / n))
        }
      }
    }(enc)
  }

  val queries: Seq[QueryDef] = Seq(

    // DSIR over the documents pool, target = the English slice: every
    // document scored by its hashed-n-gram importance weight against
    // the en model, top 25% by avg bits/feature flagged selected. The
    // oracle replays hashing, both smoothed models, the signed
    // integer-bit log ratio, and the selection window bit-for-bit.
    QueryDef(
      "t_dsir",
      (s, d) => {
        import s.implicits._
        dsirWeights(table(s, d, "documents"), $"doc_id", $"text",
          $"lang" === "en")
          .orderBy($"doc_id")
      },
      Some(s"""WITH $dsirPerDocCtes,
              ranked AS (
                SELECT *, row_number() OVER
                         (ORDER BY dsir_avg_bits DESC, doc_id ASC) AS rn,
                       count(*) OVER () AS n_docs
                FROM perdoc)
              SELECT doc_id, n_feats, dsir_sum_bits, dsir_avg_bits,
                     rn <= ceil(n_docs * 0.25) AS selected
              FROM ranked ORDER BY doc_id""")),

    // ONLINE DSIR scoring under batch execution: the first 100
    // documents replayed as arrivals against the frozen ratio table
    // trained on the FULL pool (buildDsirModel's loud-capped collect).
    // Every arrival is in-corpus, so the weights are exactly t_dsir's
    // rows for those ids — the oracle is the batch replay restricted,
    // holding the JVM hash+shift scorer to bit-equality with the
    // column-algebra form.
    QueryDef(
      "w_dsir",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val model = buildDsirModel(docs, $"doc_id", $"text", $"lang" === "en")
        withOnlineDsirScore(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(s"""WITH $dsirPerDocCtes
              SELECT doc_id, n_feats, dsir_sum_bits, dsir_avg_bits
              FROM perdoc WHERE doc_id < 100 ORDER BY doc_id"""))
  )

  /** Shared oracle CTE chain: tokenize + hashed features + both
    * smoothed models + the signed integer-bit ratio + per-doc sums —
    * everything up to `perdoc`, shared verbatim by t_dsir (which adds
    * the selection window) and w_dsir (which restricts to the served
    * arrivals). */
  private lazy val dsirPerDocCtes: String = """t AS (
                SELECT doc_id, lang = 'en' AS is_target,
                       [x for x in string_split_regex(lower(text), '\s+') if x != ''] AS toks
                FROM documents),
              feats AS (
                SELECT doc_id, is_target,
                       ('0x' || substring(md5(w), 1, 15))::BIGINT % 256 AS f
                FROM (SELECT doc_id, is_target, unnest(toks) AS w FROM t)
                UNION ALL
                SELECT doc_id, is_target,
                       ('0x' || substring(md5(b.w1 || ' ' || b.w2), 1, 15))::BIGINT % 256 AS f
                FROM (SELECT doc_id, is_target,
                             unnest([{'w1': toks[i], 'w2': toks[i+1]}
                                     for i in range(1, len(toks))]) AS b
                      FROM t)),
              cr AS (SELECT f, count(*) AS crn FROM feats GROUP BY f),
              ct AS (SELECT f, count(*) AS ctn FROM feats WHERE is_target GROUP BY f),
              tot AS (
                SELECT count(*) AS nr,
                       (SELECT count(*) FROM feats WHERE is_target) AS nt
                FROM feats),
              lam AS (
                SELECT f, num, den,
                       CASE WHEN k0 >= 0
                            THEN CASE WHEN (den << k0) <= num THEN k0 ELSE k0 - 1 END
                            ELSE CASE WHEN (num << -k0) >= den THEN k0 ELSE k0 - 1 END
                       END AS lam
                FROM (
                  SELECT cr.f,
                         (coalesce(ct.ctn, 0) + 1) * (tot.nr + 256) AS num,
                         (cr.crn + 1) * (tot.nt + 256) AS den,
                         length(bin((coalesce(ct.ctn, 0) + 1) * (tot.nr + 256)))
                           - length(bin((cr.crn + 1) * (tot.nt + 256))) AS k0
                  FROM cr LEFT JOIN ct USING (f) CROSS JOIN tot)),
              perdoc AS (
                SELECT feats.doc_id,
                       CAST(count(*) AS BIGINT) AS n_feats,
                       CAST(sum(lam.lam) AS BIGINT) AS dsir_sum_bits,
                       CAST(sum(lam.lam) AS DOUBLE) / count(*) AS dsir_avg_bits
                FROM feats JOIN lam USING (f) GROUP BY feats.doc_id)"""
}
