package graft.ops

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Curate]] (systematic weighted sampling, length-bucketed batching)
  * and the dd_cluster_keepbest survivor policy. Each operator is pinned
  * EXACTLY against its naive unpartitioned-window / JVM-argmax twin on
  * real testdata, plus the semantic properties the operator exists for
  * (sample-size bound, heavy-row absorption, batch-size bound,
  * keeper-quality maximality). */
class CurateSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t_sample_weighted == naive global-window systematic sample, <= m selected") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val got = Curate.systematicSample(docs, $"doc_id", $"text", m = 200)
      .select($"doc_id", $"n_tokens", $"w_before", $"selected").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // bounded-global-window: test-only naive twin at sf0.001
    val in = docs.select($"doc_id",
      size(TextAnalysis.tokens($"text")).cast("long").as("w"),
      PortableHash.md5Hash60($"doc_id".cast("string")).as("h"))
    val tot = in.agg(sum($"w")).head().getLong(0)
    val wPrev = Window.orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = in
      .withColumn("off", coalesce(sum($"w").over(wPrev), lit(0L)))
      .withColumn("sel",
        expr(s"((off + w) * 200) div $tot") > expr(s"(off * 200) div $tot"))
      .select($"doc_id", $"w", $"off", $"sel").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got == naive)
    val nSel = got.values.count(_._3)
    assert(nSel > 0 && nSel <= 200, s"selected $nSel of ${got.size}")
  }

  test("systematic sample: a document heavier than the stride absorbs boundaries but is selected once") {
    import spark.implicits._
    // 10 one-token docs + one 1000-token doc, m = 5: stride = 202, the
    // heavy doc spans >= 4 boundaries wherever the hash order puts it
    val docs = ((1L to 10L).map(i => (i, "w")) :+ (99L, Seq.fill(1000)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curate.systematicSample(docs, $"doc_id", $"text", m = 5)
      .select($"doc_id", $"selected").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(99L), "the heavy document must be selected")
    val nSel = out.values.count(identity)
    assert(nSel <= 5 && nSel >= 1, s"selected $nSel")
    // weight-proportionality sanity: the heavy doc holds 99% of the
    // weight, so at most m - 1 light docs can be selected
    assert(out.filterKeys(_ != 99L).values.count(identity) <= 4)
  }

  test("t_batch_bylen == naive per-band window batching; batches bounded and band-homogeneous") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val got = Curate.lengthBatches(docs, $"doc_id", $"text")
      .select($"doc_id", $"n_tokens", $"len_band", $"batch").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // bounded-global-window: test-only naive per-band twin at sf0.001
    val in = docs.select($"doc_id",
        size(TextAnalysis.tokens($"text")).cast("long").as("n_tokens"),
        PortableHash.md5Hash60($"doc_id".cast("string")).as("h"))
      .withColumn("len_band", least(expr("n_tokens div 64"), lit(16L)))
    val naive = in.withColumn("rib",
        row_number().over(Window.partitionBy($"len_band").orderBy($"h", $"doc_id")))
      .withColumn("batch", expr("(rib - 1) div 32"))
      .select($"doc_id", $"n_tokens", $"len_band", $"batch").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == naive)
    // every batch holds <= 32 docs, all of the same band (the key is
    // (band, batch) so homogeneity is structural; the bound is not)
    val sizes = got.values.groupBy(v => (v._2, v._3)).view.mapValues(_.size)
    assert(sizes.values.forall(_ <= 32))
    // within each band, batch ids are contiguous from 0 and all but
    // the last are FULL (the whole point of banded batching)
    got.values.groupBy(_._2).foreach { case (band, vs) =>
      val byBatch = vs.groupBy(_._3).view.mapValues(_.size).toMap
      val maxB = byBatch.keys.max
      assert(byBatch.keySet == (0L to maxB).toSet, s"band $band gaps")
      (0L until maxB).foreach(b =>
        assert(byBatch(b) == 32, s"band $band batch $b not full"))
    }
  }

  test("t_select_quality: corpus-relative selection == naive global-window top half") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val got = graft.SparkEntry.queries("t_select_quality")(spark, sf)
      .filter($"selected").select($"doc_id").collect().map(_.getLong(0)).toSet
    // bounded-global-window: test-only naive twin at sf0.001
    val q = docs.withColumn("__toks", TextAnalysis.tokens($"text"))
      .select($"doc_id", TextAnalysis.qualityScoreOf($"text", $"__toks").as("q"))
    val n = q.count()
    val naive = q.withColumn("rn",
        row_number().over(Window.orderBy($"q".desc, $"doc_id".asc)))
      .filter($"rn" <= math.ceil(n * 0.5).toLong)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == naive && got.size == math.ceil(n * 0.5).toLong)
  }

  test("w_select_quality: frozen threshold == batch selection's min kept quality; ties over-admit") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("w_select_quality")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.nonEmpty && out.forall(_._1 < 100))
    // one frozen threshold on every row
    assert(out.map(_._3).distinct.length == 1)
    val thr = out.head._3
    // the threshold is exactly the batch form's minimum KEPT quality
    val kept = graft.SparkEntry.queries("t_select_quality")(spark, sf)
      .filter($"selected").agg(min($"quality")).head().getDouble(0)
    assert(thr == kept)
    // admitted == score >= threshold, row by row
    assert(out.forall { case (_, q, t, a) => a == (q >= t) })
    // the gate is not degenerate on the replayed slice
    assert(out.exists(_._4) && out.exists(!_._4))
  }

  test("t_pack_split: segments tile every document exactly and fill every non-final shard to the budget") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val segs = Curate.packSegments(docs, $"doc_id", $"text",
        budget = 500L, bucketWidth = 100L)
      .select($"doc_id", $"n_tokens", $"token_offset", $"shard",
        $"tok_start", $"tok_len")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(segs.nonEmpty)
    // every document's segments are contiguous from 0 and tile n_tokens
    segs.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._5 == 0L, s"doc $id starts at ${sorted.head._5}")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 + a._6 == b._5, s"doc $id gap between segments")
        case _ =>
      }
      assert(sorted.map(_._6).sum == sorted.head._2, s"doc $id tiling != n_tokens")
      assert(sorted.forall(_._6 > 0), s"doc $id empty segment")
    }
    // every shard except the last holds exactly the budget
    val byShard = segs.groupBy(_._4).view.mapValues(_.map(_._6).sum).toMap
    val maxShard = byShard.keys.max
    byShard.foreach { case (sh, tot) =>
      if (sh < maxShard) assert(tot == 500L, s"shard $sh holds $tot != 500")
      else assert(tot <= 500L, s"last shard $sh overfull: $tot")
    }
    // the small budget forces real spill: some doc spans >= 2 shards
    assert(segs.groupBy(_._1).values.exists(_.length >= 2), "no doc ever spilled")
    // zero-token documents emit no segment
    val zeroDocs = docs.select($"doc_id",
        size(TextAnalysis.tokens($"text")).as("n")).filter($"n" === 0)
      .collect().map(_.getLong(0)).toSet
    assert(zeroDocs.intersect(segs.map(_._1).toSet).isEmpty)
  }

  test("dd_cluster_keepbest: keeper is the cluster's quality argmax (ties to lowest id), counts exact") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val nDocs = docs.count()
    // member frame from the oracled dd_cluster query (same CC pipeline)
    val memb = graft.SparkEntry.queries("dd_cluster")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = docs
      .withColumn("__toks", TextAnalysis.tokens($"text"))
      .select($"doc_id", TextAnalysis.qualityScoreOf($"text", $"__toks").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = memb.groupBy(_._2).map { case (cluster, ms) =>
      val ids = ms.keys.toSeq
      val bestQ = ids.map(quality).max
      val keeper = ids.filter(id => quality(id) == bestQ).min
      cluster -> (keeper, ids.size.toLong, bestQ)
    }
    val got = graft.SparkEntry.queries("dd_cluster_keepbest")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == want)
    assert(got.values.map(_._2).sum == nDocs, "members must partition the corpus")
  }
}
