package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import Similarity._

  test("bruteForceTopK: known geometry, self excluded, ranks ordered") {
    import spark.implicits._
    // v1 along x, v2 = near-copy of v1, v3 orthogonal, v4 opposite
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(-1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val got = bruteForceTopK(vecs.filter($"id" === 1), vecs, 3)
      .orderBy($"rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L)) // by cosine desc
    assert(got.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    assert(got(0).getDouble(2) > 0.99 && got(2).getDouble(2) == -1.0)
    assert(!got.map(_.getLong(1)).contains(1L)) // self excluded
  }

  test("quantizeInt8: hand-checked codes, zero-vector edge, reconstruction error bound") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(2.0f))).toDF("vec_id", "embedding")
    val rows = quantizeInt8(df, $"vec_id", $"embedding")
      .orderBy($"vec_id").collect()
    // maxabs 1.0 -> scale 127; floor(63.5+0.5)=64, floor(-126.5)=-127,
    // floor(32.25)=32; worst reconstruction is the first component
    assert(rows(0).getAs[String]("codes_str") == "64,-127,32")
    assert(rows(0).getAs[Double]("scale") == 127.0)
    assert(rows(0).getAs[Double]("max_err") == (64.0 / 127.0 - 0.5))
    // zero vector: scale 0, all-zero codes, zero error — never NaN/Inf
    assert(rows(1).getAs[Double]("scale") == 0.0)
    assert(rows(1).getAs[String]("codes_str") == "0,0")
    assert(rows(1).getAs[Double]("max_err") == 0.0)
    // the max element always lands exactly on +-127
    assert(rows(2).getAs[String]("codes_str") == "127")
    assert(rows(2).getAs[Double]("max_err") == 0.0)
    // corpus-wide: the error bound |code/scale - x| <= 0.5/scale holds
    // on every real vector (floor(y+0.5) is within 0.5 of y)
    val bad = quantizeInt8(
        graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings"),
        $"vec_id", $"embedding")
      .filter($"scale" > 0 && $"max_err" > lit(0.5) / $"scale")
      .count()
    assert(bad == 0L)
  }

  test("native DotProduct == aggregate(zip_with) fold, bit for bit, interpreted and codegen") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(200)
      .select($"vec_id", asDouble($"embedding").as("v"))
    val folded = emb.select($"vec_id",
      aggregate(zip_with($"v", reverse($"v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val native = emb.select($"vec_id",
      graft.functions.VectorExpressions.dotProduct($"v", reverse($"v")).as("d"))
    val f = folded.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(f == n) // exact double equality across all 200 vectors
    // null propagation
    val row = spark.sql("SELECT 1").select(
      graft.functions.VectorExpressions.dotProduct(
        lit(null).cast("array<double>"), array(lit(1.0)))).head()
    assert(row.isNullAt(0))
  }

  test("dot/l2norm are exact on representable values") {
    import spark.implicits._
    val df = Seq((Seq(3.0f, 4.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val row = df.select(
      dot(asDouble($"a"), asDouble($"b")),
      l2norm(asDouble($"a"))).head()
    assert(row.getDouble(0) == 7.0 && row.getDouble(1) == 5.0)
  }

  test("hyperplaneBucket: deterministic and stable for identical vectors") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50).select($"vec_id", asDouble($"embedding").as("v"))
    val b1 = emb.select($"vec_id", hyperplaneBucket($"v").as("b")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = emb.select($"vec_id", hyperplaneBucket($"v").as("b")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < 256)) // 8 planes -> 2^8 buckets
  }

  test("hyperplaneBandBuckets: band value ranges disjoint, duplicate vectors collide everywhere") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(30).select($"vec_id", asDouble($"embedding").as("v"))
    val rows = emb.select($"vec_id", hyperplaneBandBuckets($"v").as("bkts")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    rows.foreach { case (id, bkts) =>
      assert(bkts.length == 8, s"vec $id")
      // value = band * 2^8 + bits: bands can never cross-collide
      bkts.zipWithIndex.foreach { case (v, b) =>
        assert(v >= b * 256 && v < (b + 1) * 256, s"vec $id band $b value $v")
      }
    }
    // a duplicated vector gets the identical signature in every band —
    // exact dup recall of the banded blocking is 1.0 by construction
    val dup = emb.limit(5).union(emb.limit(5))
      .select(hyperplaneBandBuckets($"v").as("bkts")).collect().map(_.getSeq[Int](0))
    assert(dup.take(5).toSeq == dup.drop(5).toSeq)
  }

  test("hyperplaneBandBucketsFixed is bit-identical to the column form") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50).select($"vec_id", asDouble($"embedding").as("v"))
    val dim = emb.select(size($"v")).head.getInt(0)
    val both = emb.select(
      hyperplaneBandBuckets($"v").as("hof"),
      hyperplaneBandBucketsFixed($"v", dim).as("fixed")).collect()
    both.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
    // bands=1, r=8 degenerates to hyperplaneBucket (same global plane
    // indices, zero band offset) — the swap s_ann_lsh relies on
    val single = emb.select(
      hyperplaneBucket($"v").as("hof"),
      element_at(hyperplaneBandBucketsFixed($"v", dim, bands = 1, r = 8), 1).as("fixed"))
      .collect()
    single.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("IVF: every returned neighbor lives in the query's probed cell") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("s_ann_ivf")(spark, sf).collect()
    assert(out.nonEmpty)
    // membership is against the TRAINED assignment (vec_id -> k-means
    // cell, a long) — not the label column the pre-trained index used
    val cells = trainedCells(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (cell, neighbor) = (r.getLong(1), r.getLong(2))
      assert(cells(neighbor) == cell, s"neighbor $neighbor outside cell $cell")
    }
    // ranks are 1..k per query, cosines descending
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.length))
      val coss = sorted.map(_.getDouble(3))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("k-means training buys recall: trained cells >= untrained label cells at every nprobe") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    def keys(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = keys(bruteForceTopK(emb.filter($"id" < 20), emb, 5))
    // the untrained baseline: the synthetic label column as the cell
    // assignment (what the pre-round-8 index searched)
    val untrainedAssign: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      cells => cells.select($"vec_id", $"label".cast("long").as("cell"))
    for (np <- Seq(1, 2, 4)) {
      val trained = keys(ivfTopK(spark, sf, nprobe = np, k = 5)).intersect(truth).size
      val untrained = keys(ivfTopK(spark, sf, nprobe = np, k = 5, untrainedAssign))
        .intersect(truth).size
      info(s"nprobe=$np: trained $trained/100, untrained $untrained/100")
      assert(trained >= untrained,
        s"nprobe=$np: trained recall $trained/100 < untrained $untrained/100")
    }
  }

  test("multi-probe IVF: recall@5 vs brute force strictly improves with nprobe") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    def keys(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = keys(bruteForceTopK(emb.filter($"id" < 20), emb, 5))
    val recalls = Seq(1, 2, 4).map { np =>
      keys(ivfTopK(spark, sf, nprobe = np, k = 5)).intersect(truth).size
    }
    // measured on this corpus with trained cells: 18/100 -> 40/100 ->
    // 63/100 (the untrained label cells gave 14 -> 28 -> 48 — the
    // trained-vs-untrained spec pins the inequality) — each probe
    // widening strictly recovers boundary neighbors nprobe=1 misses
    assert(recalls(1) > recalls(0),
      s"recall@5 did not improve from nprobe=1 (${recalls(0)}) to 2 (${recalls(1)})")
    assert(recalls(2) > recalls(1),
      s"recall@5 did not improve from nprobe=2 (${recalls(1)}) to 4 (${recalls(2)})")
    // an nprobe=mp result can only ADD neighbors from runner-up cells;
    // candidates from the winning cell are identical, so per-query
    // candidate supersets guarantee monotone recall — spot-check the
    // registered query pair agrees on shape
    val q1 = graft.SparkEntry.queries("s_ann_ivf")(spark, sf)
    val q2 = graft.SparkEntry.queries("s_ann_ivf_mp")(spark, sf)
    assert(q1.columns.toSeq == q2.columns.toSeq)
  }

  test("ADC re-rank: recall@5 vs brute force, score error bound, zero vectors excluded") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val exact = bruteForceTopK(
        graft.model.Tables.table(spark, d, "embeddings")
          .select($"vec_id".as("id"), $"embedding".as("vec"))
          .filter($"id" < 20),
        graft.model.Tables.table(spark, d, "embeddings")
          .select($"vec_id".as("id"), $"embedding".as("vec")), 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = adcTopK(spark, d, m = 10, k = 5).collect()
    val adcPairs = adc.map(r => (r.getLong(0), r.getLong(2))).toSet
    // int8 codes preserve cosine order almost perfectly; the re-ranked
    // top-5 recovers >= 90% of the exact top-5 (measured 1.0 at sf0.01)
    val recall = (exact & adcPairs).size.toDouble / exact.size
    assert(recall >= 0.9, s"ADC recall@5 = $recall")
    // the quantized score tracks the exact score tightly corpus-wide
    assert(adc.forall(r => math.abs(r.getDouble(4) - r.getDouble(3)) < 0.02))
    // exact cosines of returned rows are real values, never NaN (zero
    // vectors are gated out by cc > 0 on both sides)
    assert(adc.forall(r => !r.getDouble(3).isNaN && !r.getDouble(4).isNaN))
  }

  test("fused Int8QuantCodes == HOF quantization chain, bit for bit, incl. zero and empty vectors") {
    import spark.implicits._
    val corpus = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", asDouble($"embedding").as("v"))
    val edge = Seq(
      (9000001L, Seq(0.0, 0.0, 0.0)), // zero vector -> all-zero codes
      (9000002L, Seq.empty[Double]),  // empty -> empty codes
      (9000003L, Seq(-2.5, 2.5))      // symmetric: floor(-126.5)= -127, floor(127.5)=127
    ).toDF("vec_id", "v")
    val both = corpus.unionByName(edge)
      .withColumn("fused", graft.functions.VectorExpressions.int8QuantCodes($"v"))
      .withColumn("__maxabs", array_max(transform($"v", x => abs(x))))
      .withColumn("__scale",
        when($"__maxabs" > 0, lit(127.0) / $"__maxabs").otherwise(lit(0.0)))
      .withColumn("hof",
        transform($"v", x => floor(x * $"__scale" + lit(0.5)).cast("double")))
    assert(both.filter(not($"fused" <=> $"hof")).count() == 0L)
    val edgeRows = both.filter($"vec_id" >= 9000000L).orderBy($"vec_id")
      .select($"fused").collect().map(_.getSeq[Double](0))
    assert(edgeRows(0) == Seq(0.0, 0.0, 0.0))
    assert(edgeRows(1).isEmpty)
    assert(edgeRows(2) == Seq(-127.0, 127.0))
  }

  test("IVF+ADC: same cells as float-scored IVF, re-rank recovers its top-3, scores tight") {
    val d = "/root/testdata/sf0.001"
    val flt = ivfTopK(spark, d, nprobe = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val adc = ivfAdcTopK(spark, d, nprobe = 2, m = 8, k = 3).collect()
    val adcPairs = adc.map(r => (r.getLong(0), r.getLong(2))).toSet
    // the ADC pass scans the SAME probed cells, so with a top-8 re-rank
    // buffer the exact top-3 should be recovered almost always
    val recall = (flt & adcPairs).size.toDouble / flt.size
    assert(recall >= 0.9, s"IVF+ADC recall@3 vs float IVF = $recall")
    // quantized score tracks the exact score on every returned row
    assert(adc.forall(r => math.abs(r.getDouble(5) - r.getDouble(4)) < 0.02))
    assert(adc.forall(r => !r.getDouble(4).isNaN && !r.getDouble(5).isNaN))
  }

  test("LSH buckets: identical vectors always collide") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.5f, -0.25f, 0.125f)), (2L, Seq(0.5f, -0.25f, 0.125f)))
      .toDF("id", "vec")
      .select($"id", hyperplaneBucket(asDouble($"vec")).as("b"))
    val bs = df.collect().map(_.getInt(1))
    assert(bs(0) == bs(1))
  }

  test("empty embeddings table: probed-bucket queries construct and return zero rows") {
    import spark.implicits._
    // the former one-row dim probe threw NoSuchElementException at
    // DataFrame-CONSTRUCTION time on an empty table
    val dir = java.nio.file.Files.createTempDirectory("graft_embempty").toString
    graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(0).write.parquet(s"$dir/embeddings.parquet")
    assert(graft.SparkEntry.queries("s_ann_lsh")(spark, dir).count() == 0)
    assert(graft.SparkEntry.queries("dd_embed_cos")(spark, dir).count() == 0)
  }

  test("dim probe runs one Spark job, then repeated query builds are job-free") {
    import spark.implicits._
    // a filter no other suite uses => a fresh probe-cache key, and a
    // parquet-backed plan, so the probe's collect() really runs a job
    // (LocalRelation collects can short-circuit the scheduler)
    val emb = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .filter($"vec_id" =!= 987654321L)
      .select($"vec_id", $"embedding".as("v"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // listener delivery is async — poll until the count stops moving
    def stableCount(): Int = {
      var last = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val cur = jobs.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      last
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      bandBucketsProbed(emb, $"v")
      val afterFirst = stableCount()
      assert(afterFirst >= 1, "first build should probe with a real Spark job")
      bandBucketsProbed(emb, $"v")
      bandBucketsProbed(emb, $"v", bands = 4, r = 8) // same probe plan -> still cached
      assert(stableCount() == afterFirst, "repeated builds must not re-probe")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("dimension-mismatched vector fails loudly instead of silently dropping") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_embmix").toString
    val base = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings").limit(5)
    base.union(Seq((999999L, Seq.fill(3)(0.5f), 0))
        .toDF("vec_id", "embedding", "label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[Exception] {
      graft.SparkEntry.queries("dd_embed_cos")(spark, dir).count()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: causes(t.getCause)
    assert(causes(e).exists(_.contains("dimension mismatch")), e.toString)
  }

  test("randomProjection: fixed form == column form bit for bit; projected top-5 overlaps exact top-5") {
    import spark.implicits._
    import graft.ops.Similarity._
    val emb = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", asDouble($"embedding").as("v"))
    val both = emb.select(
        randomProjection(emb, $"v", 16).as("fx"),
        randomProjectionCol($"v", 16).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1),
        "fixed and HOF projections diverged")
    }
    // what JL projection provably preserves: identical vectors
    // project identically, so every verbatim twin in the registered
    // query's corpus must serve at rank 1 in projected space
    val rows = graft.SparkEntry.queries("s_ann_proj")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    (0L until 10L).foreach { q =>
      val r1 = rows.find(r => r._1 == q && r._2 == 1).map(_._3)
      assert(r1.contains(1000000L + q),
        s"query $q: projected rank-1 is $r1, not its verbatim twin")
    }
    // and the honest tradeoff measurement: on THIS isotropic corpus
    // (concentrated cosines, tiny top-5 margins) the non-twin tail
    // keeps little of the exact top-5 — record it as a floor so a
    // silent projection bug (e.g. constant output) still trips
    def top5(vec: org.apache.spark.sql.DataFrame) = bruteForceTopK(
        vec.filter($"id" < 20), vec, 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = top5(emb.select($"vec_id".as("id"), $"v".as("vec")))
    val proj = top5(emb.select($"vec_id".as("id"),
      randomProjection(emb, $"v", 16).as("vec")))
    val overlap = (exact intersect proj).size.toDouble / exact.size
    assert(overlap > 0.0, s"projected top-5 shares nothing with exact: $overlap")
  }
}
