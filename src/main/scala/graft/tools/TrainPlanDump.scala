package graft.tools

import org.apache.spark.sql.functions._

/** Write the `explain("formatted")` of the INDEX-BUILD subtrees that
  * the serving queries hide behind a [[graft.ops.Checkpoints]] lease
  * (the lease materializes eagerly at query construction, so
  * [[ExplainDump]]'s per-query files show only the serving plan).
  * Committed next to the serving plans under `plans/<round>/` as the
  * build-side before/after evidence of the optimization rounds.
  * Usage: sbt "runMain graft.tools.TrainPlanDump <sfDir> <outDir> <suffix>" */
object TrainPlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args: @unchecked
    val spark = graft.model.Tables.buildLocalSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val emb = graft.model.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.ops.Similarity.asDouble(col("embedding")).as("v"))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[trainplan] wrote $outDir/${name}_$suffix.txt")
    }
    // the k-means coarse-quantizer training (shared by every s_ann_ivf*
    // / s_ann_ivfpq* / dd_semdedup* / w_semdedup / s_hard_negatives
    // index build)
    dump("train_kmeans_cents", graft.ops.Similarity.kmeansCents(emb))
    // the corpus-with-cell assignment frame the IVF index leases
    dump("train_kmeans_assigned", graft.ops.Similarity.kmeansAssigned(emb))
    // the PQ training + serving-codebook reconstruction (s_ann_pq,
    // s_ann_ivfpq*) — the UNLEASED plan, so the 4 Lloyd rounds show
    dump("train_pq_recon", graft.ops.ProductQuant.pqReconPlan(emb))
    // the frozen-codebook build of the IVFADC lifecycle family
    // (s_ann_ivfpq_add/stored/del/compact) — the UNLEASED book plan
    // over the leased training artifacts, mirroring
    // IvfPqAdd.frozenArtifacts' construction step for step
    locally {
      val embN = emb.withColumn("nrm", graft.ops.Similarity.l2norm(col("v")))
      val coarse = graft.ops.Checkpoints.lease("tpd_coarse",
        graft.ops.Similarity.kmeansAssigned(embN))
      val centroids = graft.ops.Checkpoints.lease("tpd_cents",
        graft.ops.Similarity.quantMeanCv(coarse, Seq("cell"))
          .select(col("cell").as("c_label"), col("cv"))
          .withColumn("cn", graft.ops.Similarity.l2norm(col("cv"))))
      val resid = coarse
        .join(broadcast(centroids.select(col("c_label").as("cell"), col("cv"))),
          Seq("cell"))
        .select(col("vec_id"),
          zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
      val codesSv = graft.ops.Checkpoints.lease("tpd_codes",
        graft.ops.ProductQuant.pqCodes(resid))
      dump("train_ivfpqadd_book", graft.ops.ProductQuant.codebookPerSub(
        graft.ops.ProductQuant.subvectors(resid), codesSv))
    }
    spark.stop()
  }
}
