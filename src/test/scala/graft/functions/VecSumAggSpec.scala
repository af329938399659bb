package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** QuantVecSumAgg pinned against the posexplode + (key, pos) aggregate
  * form it replaced in every trained-index centroid stage: the
  * quantized means must be BIT-identical (same exact-integer sums,
  * same single double division), on the real corpus and on the ragged
  * / null-element / null-row synthetics the explode form's semantics
  * are defined by. */
class VecSumAggSpec extends AnyFunSuite with SparkSpec {

  /** The replaced form, verbatim: per (keys, pos) quantized mean,
    * reassembled position-ascending. */
  private def explodeForm(df: DataFrame, keys: Seq[String], v: String): DataFrame =
    df.select(keys.map(col) :+ posexplode(col(v)).as(Seq("pos", "x")): _*)
      .groupBy((keys :+ "pos").map(col): _*).agg(
        (sum(floor(col("x") * lit(1e6)).cast("long")).cast("double") /
          (count(lit(1)) * lit(1e6))).as("cx"))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pc"))
      .select(keys.map(col) :+ transform(col("pc"), p => p.getField("cx")).as("cv"): _*)

  private def collectCv(df: DataFrame, keys: Seq[String]): Map[Seq[Any], Seq[Double]] =
    df.collect().map { r =>
      keys.indices.map(r.get).toSeq -> r.getSeq[Double](keys.length)
    }.toMap

  test("quantMeanCv is bit-identical to the explode form on the real corpus") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("cell", pmod($"vec_id" * 2654435761L, lit(7L)))
    val a = collectCv(graft.ops.Similarity.quantMeanCv(emb, Seq("cell")), Seq("cell"))
    val b = collectCv(explodeForm(emb, Seq("cell"), "v"), Seq("cell"))
    assert(a.keySet == b.keySet)
    // exact comparison: java.lang.Double.compare per element (bitwise
    // for all non-NaN values; the kernel never produces NaN here)
    a.foreach { case (k, av) =>
      val bv = b(k)
      assert(av.length == bv.length, s"dim mismatch at $k")
      av.indices.foreach(i => assert(av(i) == bv(i), s"cell $k pos $i: ${av(i)} != ${bv(i)}"))
    }
  }

  test("ragged groups, null elements, and null rows match the explode form") {
    import spark.implicits._
    val df = Seq(
      (0L, Some(Seq(Some(1.25), Some(-2.5), Some(3.0)))),
      (0L, Some(Seq(Some(0.5), None))), // short + null element
      (0L, None),                       // null row: contributes nothing
      (1L, Some(Seq(Some(-0.0000004)))),
      (1L, Some(Seq[Option[Double]]())) // empty array
    ).toDF("cell", "v").select($"cell", $"v".cast("array<double>").as("v"))
    val a = collectCv(graft.ops.Similarity.quantMeanCv(df, Seq("cell")), Seq("cell"))
    val b = collectCv(explodeForm(df, Seq("cell"), "v"), Seq("cell"))
    // position 1 of cell 0: the null element is summed as 0 but its
    // row still counts — (floor(-2.5e6) + 0) / (2 * 1e6)
    assert(a(Seq(0L))(1) == (-2500000L + 0L) / (2 * 1e6))
    assert(a == b)
  }

  test("an all-null position yields a NULL mean, exactly like the explode form's sum() over only NULLs") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(Some(1.25), None)),
      (0L, Seq(Some(-2.5), None)) // position 1 is NULL in EVERY row
    ).toDF("cell", "v").select($"cell", $"v".cast("array<double>").as("v"))
    val ours = graft.ops.Similarity.quantMeanCv(df, Seq("cell"))
    val theirs = explodeForm(df, Seq("cell"), "v")
    // position 0 is a real mean; position 1 must be NULL (not 0.0 — a
    // zero would be indistinguishable from a true zero-sum position)
    val row = ours.select(element_at($"cv", 1), element_at($"cv", 2)).head()
    assert(row.getDouble(0) == (1250000L - 2500000L) / (2 * 1e6))
    assert(row.isNullAt(1), s"all-null position was ${row.get(1)}, expected NULL")
    val trow = theirs.select(element_at($"cv", 1), element_at($"cv", 2)).head()
    assert(trow.isNullAt(1) && trow.getDouble(0) == row.getDouble(0))
  }

  test("per-subspace keys (the PQ codebook shape) match the explode form") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("sub", ($"vec_id" % 4).cast("int"))
      .withColumn("cell", pmod($"vec_id" * 40503L, lit(5L)))
      .select($"sub", $"cell", slice($"v", 1, 16).as("sv"))
    val a = collectCv(graft.ops.Similarity.quantMeanCv(emb, Seq("sub", "cell"), "sv"), Seq("sub", "cell"))
    val b = collectCv(explodeForm(emb, Seq("sub", "cell"), "sv"), Seq("sub", "cell"))
    assert(a == b)
  }

  test("result is partition-invariant (order-insensitive long sums)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("cell", pmod($"vec_id", lit(3L)))
    val a = collectCv(graft.ops.Similarity.quantMeanCv(emb, Seq("cell")), Seq("cell"))
    val b = collectCv(graft.ops.Similarity.quantMeanCv(emb.repartition(13), Seq("cell")), Seq("cell"))
    assert(a == b)
  }
}
