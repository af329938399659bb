package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSpec {
  import Dedup._

  private val sf = "/root/testdata/sf0.001"

  test("wordShingles: short texts yield empty sets, no errors") {
    import spark.implicits._
    val df = Seq("one two", "", "a b c d").toDF("text")
      .select(wordShingles($"text").as("g"))
    val sizes = df.select(size($"g")).collect().map(_.getInt(0)).toSeq
    assert(sizes == Seq(0, 0, 2))
  }

  test("jaccard: identical sets = 1, disjoint = 0") {
    import spark.implicits._
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c", "d"))).toDF("x", "y", "z")
    val row = df.select(jaccard($"x", $"y"), jaccard($"x", $"z")).head()
    assert(row.getDouble(0) == 1.0 && row.getDouble(1) == 0.0)
  }

  test("exactGroups finds planted exact duplicates, keeper = min id") {
    import spark.implicits._
    val df = Seq((1L, "Hello World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = exactGroups(df, $"text", $"doc_id")
      .orderBy($"keeper").collect()
    // 1 and 2 collide after lowercasing
    assert(groups.length == 2)
    assert(groups(0).getLong(1) == 1L && groups(0).getLong(2) == 2L)
    assert(groups(1).getLong(1) == 3L && groups(1).getLong(2) == 1L)
  }

  test("dupNgramStats: hand-built shared spans, symmetry, short docs, partition-invariant") {
    import spark.implicits._
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 tail-a unique-a"
    val b = "head-b w1 w2 w3 w4 w5 w6 w7 w8 unique-b"
    val df = Seq(
      (1L, a),            // shares the 8-gram w1..w8 with doc 2
      (2L, b),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9"), // unique 8-grams only
      (4L, "too short"),  // < 8 tokens -> 0 grams, 0 dup, ratio 0
      (5L, a)             // exact copy of doc 1: ALL grams duplicated
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      dupNgramStats(d, $"doc_id", $"text", n = 8)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val rows = run(df)
    // doc1: 3 grams (w1..w8, w2..tail-a, w3..unique-a); w1..w8 in docs
    // 2 and 5, and the other two grams recur verbatim in doc 5
    assert(rows(0) == ((1L, 3L, 3L, 1.0)))
    assert(rows(1) == ((2L, 3L, 1L, 1.0 / 3))) // only the shared span
    assert(rows(2) == ((3L, 2L, 0L, 0.0)))
    assert(rows(3) == ((4L, 0L, 0L, 0.0)))
    assert(rows(4) == ((5L, 3L, 3L, 1.0)))
    // duplication is symmetric across exact copies and invariant to
    // input partitioning (hash-aggregated, no order dependence)
    assert(run(df.repartition(7)).toSeq == rows.toSeq)
  }

  test("containmentPairs: quoted short doc found in both directions correctly, Jaccard would miss it") {
    import spark.implicits._
    val quoted = "q1 q2 q3 q4 q5 q6 q7 q8"                       // 6 distinct 3-grams
    val long = quoted + " f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12 f13 f14 f15 f16"
    val df = Seq(
      (1L, quoted),                 // fully contained in doc 2
      (2L, long),                   // contains doc 1 (22 grams)
      (3L, "z1 z2 z3 z4 z5 z6 z7")  // unrelated
    ).toDF("doc_id", "text")
    val got = containmentPairs(df, tn = 9, td = 10, minGrams = 5)
      .orderBy($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
    // C(1 -> 2) = 6/6 = 1.0; C(2 -> 1) = 6/22 < 0.9 (directional!);
    // the symmetric Jaccard of the pair is 6/22 ~ 0.27 — a 0.9-Jaccard
    // pass would never surface this pair
    assert(got.toSeq == Seq((1L, 2L, 6L, 1.0)))
    // lowering the threshold to 1/4 surfaces the reverse direction too
    val both = containmentPairs(df, tn = 1, td = 4, minGrams = 5)
      .orderBy($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(both.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("fused PositionalGramHashes == slice/array_join/md5 column form, bit for bit") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val bound = docs.select($"doc_id",
        graft.functions.TextShingles.positionalGramHashes($"text", 8).as("fused"),
        graft.functions.TextShingles.wordTokens($"text").as("__toks"))
      .withColumn("n_tokens", size($"__toks").cast("long"))
    // fused array length = max(m - 7, 0), and every element equals the
    // md5Hash60 of the re-sliced space-joined gram at that position
    assert(bound.filter(
      size($"fused") =!= greatest($"n_tokens" - 7L, lit(0L)).cast("int")).count() == 0L)
    val perPos = bound.filter($"n_tokens" >= 8)
      .select($"doc_id", $"__toks", $"fused",
        explode(sequence(lit(1L), $"n_tokens" - 7L)).as("pos"))
      .withColumn("h_hof", graft.functions.PortableHash.md5Hash60(
        array_join(slice($"__toks", $"pos".cast("int"), lit(8)), " ")))
      .withColumn("h_fused", element_at($"fused", $"pos".cast("int")))
    assert(perPos.filter($"h_hof" =!= $"h_fused").count() == 0L)
  }

  test("dupNgramSpans: run lengths in tokens, scattered vs consecutive, short docs, partition-invariant") {
    import spark.implicits._
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 tail-a unique-a"
    val df = Seq(
      (1L, a),                                    // whole doc copied by doc 5
      (2L, "head-b w1 w2 w3 w4 w5 w6 w7 w8 unique-b"), // one embedded 8-token span
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9"),        // unique -> no spans
      (4L, "too short"),                          // < 8 tokens -> 0 positions
      (5L, a)
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      dupNgramSpans(d, $"doc_id", $"text", n = 8)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = run(df)
    // doc1: all 3 gram positions duplicated consecutively -> the full
    // 10-token doc is one copied span (3 grams cover 3 + 7 tokens)
    assert(rows(0) == ((1L, 3L, 3L, 10L)))
    // doc2: only the middle position (w1..w8) is duplicated -> an
    // 8-token span, NOT 3 scattered grams (the count-based signal
    // cannot make this distinction; the positional one must)
    assert(rows(1) == ((2L, 3L, 1L, 8L)))
    assert(rows(2) == ((3L, 2L, 0L, 0L)))
    assert(rows(3) == ((4L, 0L, 0L, 0L)))
    assert(rows(4) == ((5L, 3L, 3L, 10L)))
    assert(run(df.repartition(7)).toSeq == rows.toSeq)
  }

  test("applySpanDedup: first occurrence survives, coverage excision, self-repeats, partition-invariant") {
    import spark.implicits._
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),           // canonical copy (lowest id)
      (2L, "z1 z2 w1 w2 w3 w4 w5 w6 w7 w8"),     // embeds doc1's gram at q=3
      (3L, "r r r r r r r r r r"),               // within-doc self-repeat
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")         // unique -> untouched
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      applySpanDedup(d, $"doc_id", $"text", n = 8)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val rows = run(df)
    // doc1 is the canonical occurrence -> fully kept
    assert(rows(0) == ((1L, 8L, 0L, md5Of("w1 w2 w3 w4 w5 w6 w7 w8"))))
    // doc2's occurrence at q=3 is non-canonical -> positions 3..10 cut
    assert(rows(1) == ((2L, 10L, 8L, md5Of("z1 z2"))))
    // doc3 repeats its own 8-gram (q=1,2,3; q=1 canonical) -> q=2,3
    // cover positions 2..10, ONE token survives
    assert(rows(2) == ((3L, 10L, 9L, md5Of("r"))))
    assert(rows(3) == ((4L, 9L, 0L, md5Of("u1 u2 u3 u4 u5 u6 u7 u8 u9"))))
    assert(run(df.repartition(7)).toSeq == rows.toSeq)
  }

  test("dd_embed_apply: one survivor per cluster, member counts partition the corpus") {
    val d = "/root/testdata/sf0.001"
    val clusters = graft.SparkEntry.queries("dd_embed_cluster")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val survivors = graft.SparkEntry.queries("dd_embed_apply")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // survivor ids are exactly the distinct cluster labels
    assert(survivors.map(_._1).toSet == clusters.map(_._2).toSet)
    // every survivor is a member of its own cluster (label = min member)
    assert(survivors.map(_._1).toSet.subsetOf(clusters.map(_._1).toSet))
    // member counts partition the corpus
    assert(survivors.map(_._2).sum == clusters.length)
    val bySize = clusters.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    survivors.foreach { case (id, n) => assert(bySize(id) == n) }
  }

  test("minhash candidates are a subset of brute-force ground truth, full recall on strong pairs") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = pairs(minhashNearDups(docs, $"doc_id", $"text", 0.5))
    // ground truth: unbanded brute force at the same threshold
    val sh = docs.select($"doc_id", wordShingles($"text").as("g"))
    val bf = pairs(sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        jaccard($"a.g", $"b.g").as("sim"))
      .filter($"sim" >= 0.5))
    assert(mh.subsetOf(bf), s"false positives: ${mh -- bf}")
    // strong pairs (jaccard >= 0.7) must all be recalled at b=16,r=2
    val strong = pairs(sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        jaccard($"a.g", $"b.g").as("sim"))
      .filter($"sim" >= 0.7))
    assert(strong.subsetOf(mh), s"missed strong pairs: ${strong -- mh}")
  }

  test("columnar simhashChunksAgg == scalar simhashChunks on real docs") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, sf, "documents").limit(100)
    val scalar = docs
      .select($"doc_id", simhashChunks(graft.ops.TextAnalysis.tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val columnar = simhashChunksAgg(
        docs.select($"doc_id", explode(graft.ops.TextAnalysis.tokens($"text")).as("tok")),
        $"doc_id", $"tok")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(columnar.keySet == scalar.keySet)
    columnar.foreach { case (id, sig) => assert(sig == scalar(id), s"doc $id") }
  }

  test("count-weighted simhashChunksAggCounted == per-occurrence simhashChunksAgg") {
    import spark.implicits._
    // the counted path hashes each distinct token once and weights the
    // vote; signatures must be bit-identical to the occurrence stream
    // (incl. md5Hash60, the dd_simhash configuration)
    val docs = graft.model.Tables.table(spark, sf, "documents").limit(200)
      .select($"doc_id", $"text")
      .union(Seq((90001L, ""), (90002L, "  rep rep rep  one "),
        (90003L, "a b a b a")).toDF("doc_id", "text"))
    val h = (c: org.apache.spark.sql.Column) => graft.functions.PortableHash.md5Hash60(c)
    val occ = simhashChunksAgg(
        docs.select($"doc_id", explode(graft.ops.TextAnalysis.tokens($"text")).as("tok")),
        $"doc_id", $"tok", hash = h, bits = 60)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val cnt = simhashChunksAggCounted(docs, $"doc_id", $"text", hash = h, bits = 60)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(cnt.keySet == occ.keySet) // empty-token docs absent from both
    cnt.foreach { case (id, sig) => assert(sig == occ(id), s"doc $id") }
  }

  test("fused HashedWordShingles == explode+hash+collect_set dedupe, both hash kinds") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
      .union(Seq((90001L, ""), (90002L, "one two"), (90003L, "a b c a b c a b c"),
        (90004L, "x y z x y z w")).toDF("doc_id", "text"))
    for ((kind, hash) <- Seq(
        "uh30" -> ((c: org.apache.spark.sql.Column) => graft.functions.PortableHash.uhBase(c)),
        "xx64" -> ((c: org.apache.spark.sql.Column) => xxhash64(c)))) {
      val viaAgg = withWordShingles(docs, $"text", "sh")
        .select($"doc_id", explode($"sh").as("g"))
        .select($"doc_id", hash($"g").as("x"))
        .groupBy($"doc_id").agg(collect_set($"x").as("xs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val fused = docs
        .select($"doc_id",
          graft.functions.TextShingles.hashedWordShingles($"text", 3, kind).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      // agg form has no row for gramless docs; fused has an empty set
      fused.foreach { case (id, hs) =>
        assert(hs == viaAgg.getOrElse(id, Set.empty[Long]), s"$kind doc $id")
      }
      assert(viaAgg.keySet.subsetOf(fused.keySet))
    }
  }

  test("fused SortedLongIntersectCount == size(array_intersect) on doc gram pairs") {
    import spark.implicits._
    val hs = graft.functions.TextShingles.hashedWordShingles($"text", 3, "xx64")
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", sort_array(hs).as("xs"))
      .union(Seq((90001L, Seq.empty[Long]), (90002L, Seq(1L, 2L, 3L)),
        (90003L, Seq(2L, 3L, 9L)), (90004L, Seq(Long.MinValue, -1L, 0L, Long.MaxValue)))
        .toDF("doc_id", "xs"))
    // all pairs over a small slice, incl. self pairs (full overlap),
    // empties, and extreme values
    val pairs = docs.limit(30).as("a").crossJoin(docs.limit(30).as("b"))
    val both = pairs.select(
      size(array_intersect($"a.xs", $"b.xs")).as("builtin"),
      graft.functions.TextShingles
        .sortedLongIntersectCount($"a.xs", $"b.xs").as("fused")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("fused MinhashSlots == per-slot min aggregates over exploded postings") {
    import spark.implicits._
    import graft.functions.PortableHash.{uhApply, uhBase}
    val h = 32
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val viaAgg = withWordShingles(docs, $"text", "sh")
      .select($"doc_id", explode($"sh").as("g"))
      .select($"doc_id", uhBase($"g").as("x"))
      .groupBy($"doc_id")
      .agg(min(uhApply(0, $"x")).as("m0"),
        (1 until h).map(i => min(uhApply(i, $"x")).as(s"m$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to h).map(r.getLong(_)).toSeq).toMap
    val fused = docs
      .select($"doc_id",
        graft.functions.MinhashSlots.minhashSlots(
          graft.functions.TextShingles.hashedWordShingles($"text", 3, "uh30"), h).as("sig"))
      .collect().filterNot(_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(fused.keySet == viaAgg.keySet) // gramless docs absent from both
    fused.foreach { case (id, sig) => assert(sig == viaAgg(id), s"doc $id") }
  }

  test("fused WordShingles expression is bit-identical to the HOF pipeline on the real corpus") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
      // edge shapes the corpus may not cover
      .union(Seq((90001L, ""), (90002L, "  one  two  "), (90003L, "a b c a b c a b c"),
        (90004L, "\tx\n y \r\n z w\t"), (90005L, "solo")).toDF("doc_id", "text"))
    val both = docs.select(
      wordShingles($"text").as("hof"),
      graft.functions.TextShingles.wordShingles($"text", 3).as("fused")).collect()
    both.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // and the fused tokenizer against its HOF reference (multiplicity
    // and order preserved, not just the distinct-set view)
    val toks = docs.select(
      graft.ops.TextAnalysis.tokensHof($"text").as("hof"),
      graft.ops.TextAnalysis.tokens($"text").as("fused")).collect()
    toks.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("dd_apply equals brute-force all-pairs domination (independent of the mirrored oracle)") {
    import spark.implicits._
    // the DuckDB oracle REPLAYS the prefix-filter + collapse pipeline,
    // so a completeness bug shared by both engines would hash-match;
    // this check is against plain all-pairs Jaccard >= 0.5 domination
    // computed with none of that machinery
    val d = "/root/testdata/sf0.001"
    val docs = graft.model.Tables.table(spark, d, "documents")
    val sets = docs.select($"doc_id",
        graft.functions.TextShingles.wordShingles($"text", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val dominated = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a < b && sa.nonEmpty && sb.nonEmpty
      if (sa & sb).size.toDouble / (sa | sb).size >= 0.5
    } yield b).toSet
    val expect = sets.map(_._1).filterNot(dominated).sorted.toSeq
    val got = graft.SparkEntry.queries("dd_apply")(spark, d)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == expect)
  }

  test("collapsed pair queries equal their uncollapsed full-corpus forms, incl. exact twins") {
    import spark.implicits._
    // the test corpora have no exact duplicates, so double the corpus:
    // every doc gets one identical twin — the within-group expansion
    // path must fire and still match the uncollapsed pairing exactly
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    val base = graft.model.Tables.table(spark, d, "documents")
    base.union(base.select(($"doc_id" + 1000000L).as("doc_id"),
        $"text", $"lang", $"source", $"n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    val docs = graft.model.Tables.table(spark, dir, "documents")
    val direct = minhashNearDups(docs.select($"doc_id", $"text"), $"doc_id", $"text", 0.5)
      .select($"id_a", $"id_b", $"sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(direct.nonEmpty, "doubled corpus must produce twin pairs")
    val collapsed = graft.SparkEntry.queries("dd_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(collapsed == direct)
  }

  test("dd_embed_cos equals an independent banded all-pairs reference, incl. exact twins") {
    import spark.implicits._
    // the DuckDB oracle REPLAYS the LCG banding, so a recall bug in the
    // band construction would hash-match on both sides; this reference
    // derives the candidate set from the COLUMN-form bucket expression
    // (no fused expression, no collapse+expand, no join machinery) and
    // plain driver-side cosine — and the corpus is doubled so the
    // within-group expansion path must fire
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_embdup").toString
    val base = graft.model.Tables.table(spark, d, "embeddings")
    base.union(base.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding", $"label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = graft.model.Tables.table(spark, dir, "embeddings")
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
      .select($"vec_id", $"v",
        Similarity.hyperplaneBandBuckets($"v", bands = 8, r = 8).as("bks"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Int](2).toSet))
    // strict left-to-right fold, the engine's (and oracle's) sum order
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val expected = (for {
      (a, va, ba) <- rows; (b, vb, bb) <- rows
      if a < b && (ba intersect bb).nonEmpty
      c = cos(va, vb) if c >= 0.4
    } yield (a, b, c)).sorted.toSeq
    val got = graft.SparkEntry.queries("dd_embed_cos")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(got == expected)
    // document the LSH recall boundary on the base corpus: banded
    // candidates are a subset of plain all-pairs >= 0.4; pairs missing
    // from `banded` are exactly those colliding in no band
    val baseRows = rows.filter(_._1 < 1000000L)
    val all = (for {
      (a, va, _) <- baseRows; (b, vb, _) <- baseRows
      if a < b
      c = cos(va, vb) if c >= 0.4
    } yield (a, b)).toSet
    val banded = expected.collect { case (a, b, _) if a < 1000000L && b < 1000000L => (a, b) }.toSet
    assert(banded.subsetOf(all), s"false positives: ${banded -- all}")
  }

  test("dd_cluster equals driver-side union-find over the pair graph, incl. exact twins") {
    import spark.implicits._
    // independent reference: plain union-find over the engine's own
    // verified pair set (dd_minhash_lsh output, itself independently
    // checked against the uncollapsed form) on a twin-doubled corpus —
    // no label propagation, no collapse, no recursive SQL
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_clu").toString
    val base = graft.model.Tables.table(spark, d, "documents")
    base.union(base.select(($"doc_id" + 1000000L).as("doc_id"),
        $"text", $"lang", $"source", $"n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    val pairs = graft.SparkEntry.queries("dd_minhash_lsh")(spark, dir)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = graft.model.Tables.table(spark, dir, "documents")
      .select($"doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val expected = ids.map(i => i -> find(i)).sortBy(_._1).toSeq
    val got = graft.SparkEntry.queries("dd_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(got == expected)
    // twins must actually cluster (the within-group path fired)
    assert(got.exists { case (id, c) => id != c })
  }

  test("decontaminate scrubs exact and near copies of blocklist docs, keeps the rest") {
    import spark.implicits._
    // corpus: an exact copy of a blocklist doc, a near copy (one token
    // appended), an unrelated doc, and a short gramless doc (never
    // pairs -> always survives)
    val bench = "the quick brown fox jumps over the lazy dog again and again tonight"
    val blocklist = Seq((100L, bench)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, bench), // exact contamination
      (2L, bench + " extra"), // near contamination (high jaccard)
      (3L, "completely different words about industrial telemetry and spark engines"),
      (4L, "too short")).toDF("doc_id", "text")
    val survivors = Dedup.decontaminate(docs, blocklist, "doc_id", $"text", 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(survivors == Seq(3L, 4L))
    // asymmetric: docs similar to EACH OTHER but not to the blocklist
    // are NOT removed (this is not self-dedup)
    val selfish = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val kept = Dedup.decontaminate(selfish, blocklist, "doc_id", $"text", 0.5)
      .count()
    assert(kept == 2L)
  }

  test("decontaminate past the broadcast cap keeps identical survivors (AQE path)") {
    import spark.implicits._
    // broadcastMaxGrams = 0 forces the no-hint strategy a corpus-sized
    // blocklist would take (the force-broadcast would die on the 8 GB
    // ceiling there) — survivors must not depend on the join strategy
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "completely unrelated content about something else"),
      (4L, "short"))
      .toDF("doc_id", "text")
    val blocklist = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    def ids(cap: Long) =
      Dedup.decontaminate(docs, blocklist, "doc_id", $"text", 0.5,
          broadcastMaxGrams = cap)
        .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(0L) == ids(Long.MaxValue) && ids(0L) == Seq(3L, 4L))
  }

  test("embedDecontaminate scrubs exact twins and near copies of blocklist vectors; zero-norm and orthogonal survive") {
    import spark.implicits._
    def prep(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("v", Similarity.asDouble($"embedding"))
      .withColumn("norm", Similarity.l2norm($"v"))
      .withColumn("vkey",
        graft.functions.VectorExpressions.floatVectorBytes($"embedding"))
    val e1 = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val e1near = Array(0.999f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val zero = Array.fill(8)(0f)
    val training = prep(Seq(
      (10L, e1),     // exact copy of a blocklist vector -> removed
      (11L, e1),     // exact twin of 10 -> removed through its rep
      (12L, e1near), // near copy (cos ~1) -> removed
      (13L, e2),     // orthogonal (cos 0) -> survives
      (14L, zero)    // zero-norm: cosine undefined -> always survives
    ).toDF("vec_id", "embedding"))
    // zero-norm BLOCKLIST vector contaminates nothing either
    val blocklist = prep(Seq((100L, e1), (101L, zero)).toDF("vec_id", "embedding"))
    def ids(cap: Long) =
      Dedup.embedDecontaminate(training, blocklist, "vec_id", 0.4,
          broadcastMaxDoubles = cap)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(ids(Long.MaxValue) == Set(13L, 14L))
    // past the broadcast cap (AQE path) survivors are identical
    assert(ids(0L) == Set(13L, 14L))
  }

  test("dd_embed_decontaminate removals are sound and exact-twin recall is total on the real corpus") {
    import spark.implicits._
    // replay the query's split on sf0.001, then check the LSH pipeline
    // against brute force: every removed vector must have a true
    // benchmark cosine >= 0.4 (no false removals), and every training
    // vector with a benchmark cosine >= 0.9 must be removed (banding
    // recall is guaranteed for near-identical vectors, which share
    // every bucket)
    val bucket = conv(substring(md5($"vec_id".cast("string")), 1, 4), 16, 10)
      .cast("int") % 100
    val all = graft.model.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"embedding", Similarity.asDouble($"embedding").as("v"))
      .withColumn("norm", Similarity.l2norm($"v"))
      .withColumn("vkey",
        graft.functions.VectorExpressions.floatVectorBytes($"embedding"))
      .withColumn("__bucket", bucket)
    val training = all.filter($"__bucket" >= 20).drop("__bucket")
    val benchmark = all.filter($"__bucket" < 20).drop("__bucket")
    val survivors = Dedup.embedDecontaminate(training, benchmark, "vec_id", 0.4)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val trainingIds = training.select($"vec_id").collect().map(_.getLong(0)).toSet
    val removed = trainingIds -- survivors
    val bf = training.filter($"norm" > 0).as("t")
      .crossJoin(benchmark.filter($"norm" > 0).as("b"))
      .select($"t.vec_id".as("tid"),
        (Similarity.dot($"t.v", $"b.v") / ($"t.norm" * $"b.norm")).as("cos"))
      .groupBy($"tid").agg(max($"cos").as("maxcos"))
    val bfContaminated = bf.filter($"maxcos" >= 0.4)
      .select($"tid").collect().map(_.getLong(0)).toSet
    val bfStrong = bf.filter($"maxcos" >= 0.9)
      .select($"tid").collect().map(_.getLong(0)).toSet
    assert(removed.subsetOf(bfContaminated), s"false removals: ${removed -- bfContaminated}")
    assert(bfStrong.subsetOf(removed), s"missed strong contamination: ${bfStrong -- removed}")
  }

  test("star contraction labels a long chain in O(log n) rounds where min-label cannot") {
    import spark.implicits._
    // path graph 0-1-2-...-199: diameter 199 >> any near-dup clique's.
    // Min-label propagation needs one round per hop — 20 rounds must
    // fail loudly; star contraction halves the structure every round
    // and must finish inside the same budget with every label = 0.
    val n = 200
    val vertices = spark.range(n).select($"id")
    val edges = spark.range(n - 1)
      .select($"id".as("id_a"), ($"id" + 1L).as("id_b"))
    intercept[IllegalArgumentException] {
      connectedMinLabels(vertices, edges, maxIters = 20).collect()
    }
    val got = connectedStarContraction(vertices, edges, maxIters = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(got == (0L until n).map(_ -> 0L))
  }

  test("star contraction equals min-label propagation on a mixed pair graph") {
    import spark.implicits._
    // two cliques bridged by an edge, a short chain, isolated vertices —
    // the same (vertices, edges) through both algorithms must agree
    val vertices = spark.range(30).select($"id")
    val cliqueA = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val bridge = Seq((4L, 10L))
    val chain = (20L until 25L).map(i => (i, i + 1))
    val edges = (cliqueA ++ cliqueB ++ bridge ++ chain).toDF("id_a", "id_b")
    val a = connectedMinLabels(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val b = connectedStarContraction(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(a == b)
    // sanity: the bridge merged the cliques under label 0
    assert(a.toMap.apply(13L) == 0L && a.toMap.apply(25L) == 20L)
  }

  test("repeated CC executions in one session do not accumulate storage blocks") {
    // round 5's bench degradation trigger: both CC functions returned
    // localCheckpoint-backed frames nobody unpersisted, so executing a
    // CC query 4x (exactly what Bench does) accumulated storage blocks
    // session-wide. The deferred-release registry frees the previous
    // invocation's blocks at the next CC entry — repeated executions
    // must hold a CONSTANT number of blocks.
    val sf = "/root/testdata/sf0.001"
    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
    // warm both CC paths once, then compare the SAME sequence against
    // itself: the steady-state block census must not grow
    run("dd_cluster_star")
    run("dd_cluster")
    val baseline = spark.sparkContext.getPersistentRDDs.size
    run("dd_cluster_star") // registry is shared: star releases min-label's blocks
    run("dd_cluster")
    // unpersist is asynchronous (blocking=false): poll briefly instead
    // of asserting on one instantaneous snapshot
    val deadline = System.currentTimeMillis() + 30000
    def now() = spark.sparkContext.getPersistentRDDs.size
    while (now() > baseline && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    assert(now() <= baseline,
      "storage blocks grew across repeated CC executions")
  }

  test("simhashChunksAgg handles book-length docs exactly (no packed-counter ceiling)") {
    import spark.implicits._
    // 2^14 tokens/doc overflowed the former packed-long counters; the
    // native aggregate's int counters are exact to 2^31 — and splitting
    // the doc across partitions must merge to the same signature
    val big = spark.range(1).select(lit(1L).as("doc_id"),
      explode(transform(sequence(lit(0), lit((1 << 14) - 1)),
        i => concat(lit("w"), (i % 977).cast("string")))).as("tok"))
    val one = simhashChunksAgg(big, $"doc_id", $"tok").collect()
    assert(one.length == 1 && one.head.getSeq[Int](1).length == 4)
    val spread = simhashChunksAgg(big.repartition(8), $"doc_id", $"tok").collect()
    assert(spread.head.getSeq[Int](1) == one.head.getSeq[Int](1),
      "partial-merge signature differs from single-partition signature")
  }

  test("simhash: identical token sets -> identical signature, hamming 0; planted near-dups are close") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "the quick brown fox", "entirely different words here")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select($"id", simhashChunks(graft.ops.TextAnalysis.tokens($"text")).as("sig"))
    val sigs = df.orderBy($"id").collect().map(_.getSeq[Int](1))
    assert(sigs(0) == sigs(1))
    val dfh = Seq((sigs(0), sigs(1)), (sigs(0), sigs(2))).toDF("a", "b")
      .select(hammingChunks($"a", $"b")).collect().map(_.getInt(0))
    assert(dfh(0) == 0 && dfh(1) > 0)
    // the corpus' strongest planted near-dup pair should be simhash-close
    val docs = graft.model.Tables.table(spark, sf, "documents")
    val top = minhashNearDups(docs, $"doc_id", $"text", 0.9)
      .orderBy($"sim".desc).limit(1).collect()
    if (top.nonEmpty) {
      val (ia, ib) = (top(0).getLong(0), top(0).getLong(1))
      val sd = docs.filter($"doc_id".isin(ia, ib))
        .select(simhashChunks(graft.ops.TextAnalysis.tokens($"text")).as("sig"))
        .collect().map(_.getSeq[Int](0))
      val h = Seq((sd(0), sd(1))).toDF("a", "b")
        .select(hammingChunks($"a", $"b")).head().getInt(0)
      assert(h <= 10, s"near-dup pair hamming $h")
    }
  }

  test("lshIncrementSurvivors: corpus always wins, keep-first within the batch, corpus untouched") {
    import spark.implicits._
    val base = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val b0 = base.filter($"doc_id" < 30)
    val batch = b0.select(($"doc_id" + 1000000L).as("doc_id"), $"text")
      .unionByName(b0.select(($"doc_id" + 2000000L).as("doc_id"),
        org.apache.spark.sql.functions.substring($"text", 1, 40).as("text")))
      .unionByName(b0.select(($"doc_id" + 3000000L).as("doc_id"),
        org.apache.spark.sql.functions.substring($"text", 1, 40).as("text")))
    val out = Dedup.lshIncrementSurvivors(base, batch).collect()
    val ids = out.map(_.getLong(0)).toSet
    // only batch rows come back — the corpus is never re-judged
    assert(ids.forall(_ >= 1000000L))
    // every verbatim re-ingest with shingles is dominated by its
    // corpus twin (sim 1.0); gramless docs are ineligible and survive
    val gramful = b0
      .filter(org.apache.spark.sql.functions.size(
        graft.functions.TextShingles.wordShingles($"text", 3)) > 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(gramful.nonEmpty)
    gramful.foreach { id =>
      assert(!ids.contains(id + 1000000L), s"verbatim twin of $id survived")
    }
    // keep-first within the batch: a +3M prefix copy is identical to
    // its +2M twin (sim 1.0), so no gramful +3M row can survive
    val prefixGramful = b0
      .select($"doc_id",
        org.apache.spark.sql.functions.substring($"text", 1, 40).as("text"))
      .filter(org.apache.spark.sql.functions.size(
        graft.functions.TextShingles.wordShingles($"text", 3)) > 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    prefixGramful.foreach { id =>
      assert(!ids.contains(id + 3000000L), s"+3M prefix copy of $id survived its +2M twin")
    }
    // and the operator found at least one genuinely novel admission
    assert(ids.exists(_ >= 2000000L), "no prefix doc admitted — fixture degenerate")
  }

  test("lshIncrementSurvivors == online keep-first index at arrival order (corpus, then batch by id)") {
    import spark.implicits._
    // the scaladoc claims the increment mirrors the streaming index
    // (Dedup.scala lshIncrementSurvivors doc) — pin it: the batch
    // admission DECISIONS must equal w_dedup_first's drop set when the
    // online index sees the corpus first and then the batch in id
    // order. Batch execution of droppedByIndex orders each band's
    // arrivals by doc_id (ts absent), and every corpus id (< 500) is
    // below every batch id (>= 1,000,000), so the union IS that
    // arrival order.
    val base = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val b0 = base.filter($"doc_id" < 30)
    val batch = b0.select(($"doc_id" + 1000000L).as("doc_id"), $"text")
      .unionByName(b0.select(($"doc_id" + 2000000L).as("doc_id"),
        org.apache.spark.sql.functions.substring($"text", 1, 40).as("text")))
      .unionByName(b0.select(($"doc_id" + 3000000L).as("doc_id"),
        org.apache.spark.sql.functions.substring($"text", 1, 40).as("text")))
    val batchIds = batch.select($"doc_id").collect().map(_.getLong(0)).toSet
    val incSurvivors = Dedup.lshIncrementSurvivors(base, batch)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val incDropped = batchIds -- incSurvivors
    // the online index over the ordered union; its drops among corpus
    // ids are corpus-internal pairing (paid when the corpus was built,
    // per the increment's contract) — the equivalence is on BATCH ids
    val onlineDropped = graft.streaming.NearDup
      .droppedByIndex(base.unionByName(batch), $"doc_id", $"text", threshold = 0.5)
      .toDF().distinct().collect().map(_.getLong(0)).toSet
      .filter(_ >= 1000000L)
    assert(incDropped == onlineDropped,
      s"inc-only: ${incDropped -- onlineDropped}; online-only: ${onlineDropped -- incDropped}")
    assert(incDropped.nonEmpty, "no drops — fixture degenerate")
  }

  test("embedIncrementSurvivors: corpus wins at cosine 1, keep-first among negated twins, zero-norm survives") {
    import spark.implicits._
    val base = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding")
    val b0 = base.filter($"vec_id" < 30)
    val neg = org.apache.spark.sql.functions
      .transform($"embedding", x => -x).as("embedding")
    val batch = b0.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
      .unionByName(b0.select(($"vec_id" + 2000000L).as("vec_id"), neg))
      .unionByName(b0.select(($"vec_id" + 3000000L).as("vec_id"), neg))
    val ids = Dedup.embedIncrementSurvivors(base, batch)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ >= 1000000L))
    val norms = base.filter($"vec_id" < 30)
      .select($"vec_id", Similarity.l2norm(Similarity.asDouble($"embedding")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val live = norms.filter(_._2 > 0).keySet
    assert(live.nonEmpty)
    // every nonzero verbatim twin falls to its corpus original
    live.foreach { id =>
      assert(!ids.contains(id + 1000000L), s"verbatim twin of $id survived") }
    // keep-first among the negated pair: +3M never survives its +2M twin
    live.foreach { id =>
      assert(!ids.contains(id + 3000000L), s"+3M negated copy of $id survived") }
    // zero-norm rows always survive (no postings, NaN-gated family rule)
    (norms.keySet -- live).foreach { id =>
      assert(ids.contains(id + 1000000L) && ids.contains(id + 2000000L) &&
        ids.contains(id + 3000000L), s"zero-norm $id dropped") }
    // and at least one negated copy was genuinely admitted
    assert(ids.exists(_ >= 2000000L))
  }
}
