package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The lease durability contract ([[Checkpoints.lease]]): local mode
  * (the default) and reliable mode (the cluster escape hatch) must
  * return the same rows with the same truncated-plan shape, reliable
  * mode must actually write through the reliable store, and it must
  * fail loudly without a checkpoint dir. */
class CheckpointsSpec extends AnyFunSuite with SparkSpec {

  private def frame = {
    import spark.implicits._
    (1L to 100L).map(i => (i, i * 2)).toDF("id", "v")
      .filter($"id" % 3 =!= 0)
  }

  private def isLogicalRdd(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }.nonEmpty

  test("local mode (default): truncated LogicalRDD plan, rows intact") {
    val out = Checkpoints.lease("spec_local", frame)
    assert(isLogicalRdd(out), out.queryExecution.logical)
    assert(out.count() === 67)
  }

  test("reliable mode without a checkpoint dir fails loudly") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    spark.conf.set(Checkpoints.LeaseModeKey, "reliable")
    try {
      val e = intercept[IllegalArgumentException] {
        Checkpoints.lease("spec_rel_nodir", frame)
      }
      assert(e.getMessage.contains("setCheckpointDir"), e.getMessage)
    } finally spark.conf.unset(Checkpoints.LeaseModeKey)
  }

  test("reliable mode: same rows, same truncated plan shape, files in the reliable store") {
    val local = Checkpoints.lease("spec_cmp_local_ref", frame)
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_spec")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Checkpoints.LeaseModeKey, "reliable")
    try {
      val reliable = Checkpoints.lease("spec_cmp_reliable", frame)
      // same rows either mode
      assert(reliable.exceptAll(local).isEmpty && local.exceptAll(reliable).isEmpty)
      // plan truncated the same way (LogicalRDD scan — what every
      // PlanSpec "Scan ExistingRDD" pin reads), so consumers are
      // mode-agnostic
      assert(isLogicalRdd(reliable), reliable.queryExecution.logical)
      // the frame went THROUGH the reliable store: checkpoint part
      // files exist under the dir — the copy an executor loss re-reads
      val files = java.nio.file.Files.walk(dir).iterator()
      var parts = 0
      while (files.hasNext) {
        if (files.next().getFileName.toString.startsWith("part-")) parts += 1
      }
      assert(parts > 0, s"no checkpoint part files under $dir")
      assert(reliable.count() === 67)
    } finally {
      spark.conf.unset(Checkpoints.LeaseModeKey)
      // best-effort cleanup; no API unsets the context checkpoint dir,
      // but every other suite runs in local mode and never reads it
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
