package graft.tools

import graft.ops.{IndexStore, IvfAdd, IvfPqAdd}

/** Build-vs-serve split for the trained ANN index families — the
  * measurement ADVICE/VERDICT r13 asked for: the `s_ann_ivfpq*` bench
  * entries each pay the full in-query INDEX BUILD (deterministic
  * k-means + per-subspace PQ codebook training) that a deployment runs
  * ONCE, so the sweep numbers read as serving cost when most of the
  * time is training. This main separates them against the same stored
  * artifacts the `*_stored` queries exercise:
  *
  *  - build  = train the frozen artifacts + IndexStore.save (the
  *             one-time job; the save forces full materialization)
  *  - serve  = reload + admit the arriving batch + serve top-k
  *             (ivfStoredTopK / ivfPqStoredTopK minus their save —
  *             what a deployment re-runs per query/batch), median of 3
  *
  * Usage: sbt "runMain graft.tools.BuildServeSplit <sfDir>"
  * Prints one JSON line per family. Run on a QUIET box (bench rule).
  */
object BuildServeSplit {

  private def time[T](body: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.model.Tables.buildLocalSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val noop = (df: org.apache.spark.sql.DataFrame) =>
      df.write.format("noop").mode("overwrite").save()

    // ---- raw IVF family (s_ann_ivf_add / s_ann_ivf_stored shape) ----
    locally {
      val root = IndexStore.scratchRoot(spark, "split_ivf", 0L)
      val (tBuild, _) = time {
        val (baseIdx, centroids) = IvfAdd.frozenIndex(spark, sfDir)
        IndexStore.save(root, "base" -> baseIdx, "centroids" -> centroids)
      }
      val serves = (1 to 3).map { _ =>
        val (t, _) = time(noop(IvfAdd.addAndServe(spark, sfDir,
          IndexStore.load(spark, root, "base"),
          IndexStore.load(spark, root, "centroids"),
          nprobe = 4, k = 5)))
        t
      }
      println(f"""{"family":"ivf","build_sec":$tBuild%.3f,""" +
        f""""serve_sec":${median(serves)}%.3f,"serve_runs":[${serves.map(t => f"$t%.3f").mkString(",")}],"sf":"$sfDir"}""")
    }

    // ---- IVF-PQ residual family (s_ann_ivfpq_add / _stored shape) ----
    locally {
      val root = IndexStore.scratchRoot(spark, "split_ivfpq", 0L)
      val (tBuild, _) = time {
        val f = IvfPqAdd.frozenArtifacts(spark, sfDir)
        IndexStore.save(root, "coarse" -> f.coarse, "centroids" -> f.centroids,
          "book" -> f.book, "codes" -> f.codes)
      }
      val serves = (1 to 3).map { _ =>
        val (t, _) = time(noop(IvfPqAdd.pqAddAndServe(spark, IvfPqAdd.Frozen(
          IndexStore.load(spark, root, "coarse"),
          IndexStore.load(spark, root, "centroids"),
          IndexStore.load(spark, root, "book"),
          IndexStore.load(spark, root, "codes")), nprobe = 4, m = 10, k = 5)))
        t
      }
      println(f"""{"family":"ivfpq","build_sec":$tBuild%.3f,""" +
        f""""serve_sec":${median(serves)}%.3f,"serve_runs":[${serves.map(t => f"$t%.3f").mkString(",")}],"sf":"$sfDir"}""")
    }

    spark.stop()
  }
}
