package graft.streaming

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The sharded broadcast-ANN serving topology: per-shard top-k fed
  * into a tournament re-rank is BIT-identical to the single-index
  * serve (total order on (cos desc, id asc) — every global winner is
  * a shard-local winner), and a broadcast cap the FULL corpus
  * exceeds still admits every shard — the reason the topology
  * exists. */
class ShardedAnnSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("sharded tournament serve == single-index serve, bit-exact") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
    val single = AnnServe.buildAnnIndex(emb, $"vec_id", $"embedding")
    val sharded = AnnServe.buildShardedAnnIndex(
      emb, $"vec_id", $"embedding", shards = 3)
    // shards partition the corpus exactly
    assert(sharded.map(_.entries.length).sum == single.entries.length)
    val q = emb.filter($"vec_id" < 20)
    val got = rows(AnnServe.withShardedAnn(
      q, $"vec_id", $"embedding", sharded, k = 5))
    val want = rows(AnnServe.withOnlineAnn(
      q, $"vec_id", $"embedding", single, k = 5))
    assert(got == want)
    assert(got.size == 20 * 5)
  }

  test("per-shard caps admit a corpus the single-index cap rejects") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
    // 500 vectors x 64 dims ~ 32k codes; 20k caps the whole corpus out
    // but admits each ~10.7k-code shard — the deployment motivation
    val cap = 20000L
    val e = intercept[IllegalArgumentException] {
      AnnServe.buildAnnIndex(emb, $"vec_id", $"embedding", maxCodes = cap)
    }
    assert(e.getMessage.contains("shard the corpus"))
    val sharded = AnnServe.buildShardedAnnIndex(
      emb, $"vec_id", $"embedding", shards = 3, maxCodesPerShard = cap)
    val got = rows(AnnServe.withShardedAnn(
      emb.filter($"vec_id" < 20), $"vec_id", $"embedding", sharded, k = 5))
    val single = AnnServe.buildAnnIndex(emb, $"vec_id", $"embedding")
    val want = rows(AnnServe.withOnlineAnn(
      emb.filter($"vec_id" < 20), $"vec_id", $"embedding", single, k = 5))
    assert(got == want)
  }

  test("per-shard stored artifacts serve bit-identically to the in-session shards") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_shardstore").toString
    val coded = AnnServe.codedFrame(emb, $"vec_id", $"embedding")
    (0 until 3).foreach { sh =>
      graft.ops.IndexStore.save(dir,
        s"ann_codes_$sh" -> coded.filter(org.apache.spark.sql.functions
          .pmod($"id", org.apache.spark.sql.functions.lit(3)) === sh))
    }
    val stored = (0 until 3).map { sh =>
      AnnServe.annIndexFromFrame(
        graft.ops.IndexStore.load(spark, dir, s"ann_codes_$sh"))
    }
    val live = AnnServe.buildShardedAnnIndex(emb, $"vec_id", $"embedding", 3)
    // the artifacts partition identically to the live shards
    assert(stored.map(_.entries.length) == live.map(_.entries.length))
    val q = emb.filter($"vec_id" < 20)
    val got = rows(AnnServe.withShardedAnn(q, $"vec_id", $"embedding", stored, k = 5))
    val want = rows(AnnServe.withShardedAnn(q, $"vec_id", $"embedding", live, k = 5))
    assert(got == want)
  }

  test("takedown serve == serve over the corpus minus the tombstoned vectors") {
    import spark.implicits._
    val emb = graft.model.Tables.table(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_takedown").toString
    graft.ops.IndexStore.save(dir,
      "ann_codes" -> AnnServe.codedFrame(emb, $"vec_id", $"embedding"))
    graft.ops.IndexStore.compact(spark, dir, "ann_codes",
      spark.range(30, 40).select($"id"), idCol = "id")
    val compacted = AnnServe.annIndexFromFrame(
      graft.ops.IndexStore.load(spark, dir, "ann_codes"))
    // reference: an index built directly from the surviving corpus
    val direct = AnnServe.buildAnnIndex(
      emb.filter($"vec_id" < 30 || $"vec_id" >= 40), $"vec_id", $"embedding")
    assert(compacted.entries.map(_.id).toSet == direct.entries.map(_.id).toSet)
    assert(!compacted.entries.exists(e => e.id >= 30 && e.id < 40))
    val q = emb.filter($"vec_id" < 20)
    val got = rows(AnnServe.withOnlineAnn(q, $"vec_id", $"embedding", compacted, k = 5))
    val want = rows(AnnServe.withOnlineAnn(q, $"vec_id", $"embedding", direct, k = 5))
    assert(got == want)
  }
}
