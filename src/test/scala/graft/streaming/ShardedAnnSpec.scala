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
}
