package graft.tools

import graft.ops.{Checkpoints, IndexStore, IvfPqAdd}

/** Throwaway phase timer for the ivfpq lifecycle queries: times each
  * eager sub-phase (training leases, IndexStore saves, serve) so the
  * optimization round can see where the seconds go.
  * Usage: sbt "runMain graft.tools.PhaseProfile <sfDir>" */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.model.Tables.buildLocalSession()
    import spark.implicits._
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.model.Tables.table(spark, sfDir, "region").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { run =>
      println(s"=== run $run ===")
      // fine-grained: the four leases of frozenArtifacts, one by one
      locally {
        import org.apache.spark.sql.functions._
        import graft.ops.{Similarity, ProductQuant}
        val emb = graft.model.Tables.table(spark, sfDir, "embeddings")
          .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
          .withColumn("nrm", Similarity.l2norm($"v"))
        val coarse = t("  lease coarse (kmeans train)") {
          Checkpoints.lease("pp_coarse", Similarity.kmeansAssigned(emb))
        }
        val centroids = t("  lease centroids") {
          Checkpoints.lease("pp_cents",
            Similarity.quantMeanCv(coarse, Seq("cell"))
              .select($"cell".as("c_label"), $"cv")
              .withColumn("cn", Similarity.l2norm($"cv")))
        }
        val resid = coarse
          .join(broadcast(centroids.select($"c_label".as("cell"), $"cv")), Seq("cell"))
          .select($"vec_id", zip_with($"v", $"cv", (a, b) => a - b).as("v"))
        val codes = t("  lease codes (pq train)") {
          Checkpoints.lease("pp_codes",
            ProductQuant.pqCodes(resid).select(col("vec_id"), col("sub"), col("cell")))
        }
        t("  lease book (reattach join)") {
          Checkpoints.lease("pp_book",
            ProductQuant.codebookPerSub(ProductQuant.subvectors(resid), codes))
        }
      }
      val f = t("frozenArtifacts (4 leases)") { IvfPqAdd.frozenArtifacts(spark, sfDir) }
      val root = IndexStore.scratchRoot(spark, "phaseprof", run.toLong)
      t("save coarse") { IndexStore.save(root, "coarse" -> f.coarse) }
      t("save centroids") { IndexStore.save(root, "centroids" -> f.centroids) }
      t("save book") { IndexStore.save(root, "book" -> f.book) }
      t("save codes") { IndexStore.save(root, "codes" -> f.codes) }
      t("compact codes") {
        IndexStore.compact(spark, root, "codes",
          spark.range(5, 10).select($"id".as("vec_id")))
      }
      val reloaded = IvfPqAdd.Frozen(
        IndexStore.load(spark, root, "coarse"),
        IndexStore.load(spark, root, "centroids"),
        IndexStore.load(spark, root, "book"),
        IndexStore.load(spark, root, "codes"))
      t("serve (pqAddAndServe reloaded)") {
        IvfPqAdd.pqAddAndServe(spark, reloaded, 4, 10, 5)
          .write.format("noop").mode("overwrite").save()
      }
      val f2 = t("frozenArtifacts again") { IvfPqAdd.frozenArtifacts(spark, sfDir) }
      t("serve (pqAddAndServe leased)") {
        IvfPqAdd.pqAddAndServe(spark, f2, 4, 10, 5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
