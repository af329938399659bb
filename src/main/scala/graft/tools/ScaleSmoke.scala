package graft.tools

import graft.model.Tables.table
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress smoke for the dedup family: amplifies the sf0.1
  * corpus `xcopies` times (each copy keeps the text, shifts doc_id),
  * producing a duplicate-SATURATED corpus — every document gains
  * C(copies, 2) true near-dup partners, the worst case for pairwise
  * stages (df per gram multiplies by `copies`, so a quadratic
  * intermediate would blow up copies² ≈ 400x while the corpus only
  * grows 20x). This is the stress the 5k-doc test set cannot apply.
  *
  * Usage: sbt "runMain graft.tools.ScaleSmoke [sfDir] [copies]"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.Tables.withSessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = table(spark, sfDir, "documents")
    val n = base.count()
    val big = base
      .crossJoin(spark.range(copies).select($"id".as("__copy")))
      .select(
        ($"doc_id" + $"__copy" * lit(1000000L)).as("doc_id"),
        $"text", $"lang", $"source", $"n_chars")
    val bigDir = java.nio.file.Files.createTempDirectory("graft_scale").toString
    big.write.parquet(s"$bigDir/documents.parquet")
    // duplicate-saturated embeddings too: every vector has copies-1
    // exact twins, the worst case for the banded-LSH blocking (twins
    // collide in EVERY band)
    table(spark, sfDir, "embeddings")
      .crossJoin(spark.range(copies).select($"id".as("__copy")))
      .select(
        ($"vec_id" + $"__copy" * lit(1000000L)).as("vec_id"),
        $"embedding", $"label")
      .write.parquet(s"$bigDir/embeddings.parquet")
    println(s"SMOKE corpus: ${n * copies} docs ($copies copies of $n)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"SMOKE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }

    try {
      time("dd_exact")(graft.SparkEntry.queries("dd_exact")(spark, bigDir).count())
      // UNCOLLAPSED prefix-filter probe: candidate volume is pair-bound
      // (stop-grams fall out of prefixes — not sum-of-df^2-bound), but
      // on this saturated corpus "pair-bound" is still quadratic in the
      // duplication factor (~49M candidates for ~1.05M true pairs)
      time("dd_apply_prefix_candidates") {
        val docs = table(spark, bigDir, "documents")
        graft.ops.Dedup.prefixCandidates(docs.select($"doc_id", $"text"))._2.count()
      }
      // the full operator collapses exact-content groups to their
      // minimal doc_id BEFORE pairing, so the pairwise stage sees the
      // 5k unique contents, not the 100k docs: 342s -> ~6s here with a
      // provably identical survivor set
      time("dd_apply")(graft.SparkEntry.queries("dd_apply")(spark, bigDir).count())
      // ngram candidate volume under saturation, uncollapsed probe: the
      // banded prefix filter at t=0.2 keeps this pair-bound (prefix
      // collisions within adjacent bands), not Σ df²-bound — the
      // pre-round-4 full-postings join would square the gram df here
      time("dd_ngram_prefix_candidates") {
        val docs = table(spark, bigDir, "documents")
        graft.ops.Dedup.prefixCandidates(
          docs.select($"doc_id", $"text",
            floor($"n_chars" / lit(50)).cast("int").as("band")),
          tn = 1, td = 5, hashKind = "xx64", banded = true)._2.count()
      }
      time("dd_minhash_lsh")(graft.SparkEntry.queries("dd_minhash_lsh")(spark, bigDir).count())
      time("dd_ngram_jaccard")(graft.SparkEntry.queries("dd_ngram_jaccard")(spark, bigDir).count())
      time("dd_apply_lsh")(graft.SparkEntry.queries("dd_apply_lsh")(spark, bigDir).count())
      time("dd_simhash")(graft.SparkEntry.queries("dd_simhash")(spark, bigDir).count())
      // banded hyperplane-LSH blocking under total vector saturation;
      // output is the inherent quadratic (every twin pair is a true
      // cosine-1 pair), candidates stay band-bounded
      time("dd_embed_cos")(graft.SparkEntry.queries("dd_embed_cos")(spark, bigDir).count())
      time("s_ann_lsh")(graft.SparkEntry.queries("s_ann_lsh")(spark, bigDir).count())
      time("t_vocab")(graft.SparkEntry.queries("t_vocab")(spark, bigDir).count())
      time("t_fingerprint")(graft.SparkEntry.queries("t_fingerprint")(spark, bigDir).count())
    } finally {
      val p = new org.apache.hadoop.fs.Path(bigDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      spark.stop()
    }
  }
}
