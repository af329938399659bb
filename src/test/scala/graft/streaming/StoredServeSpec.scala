package graft.streaming

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The durable broadcast-index serving forms are BIT-EQUAL to their
  * build-in-session twins: the stored artifact (coded ANN corpus,
  * LM count frames, decontamination blocklist signatures) reloads
  * from parquet and serves the exact row set — every stored value is
  * an exact long, an int-valued double, or an md5 string, so the
  * round-trip may not perturb a single bit. The driver's oracle
  * hash-compare proves this transitively at sf0.01/sf0.1 (both twins
  * hash-match the same DuckDB replay); this spec pins it directly,
  * including the exact doubles, at smoke scale. */
class StoredServeSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stored broadcast-index serving == built serving, bit-equal: ANN, LM, decontamination") {
    Seq(
      "w_ann" -> "w_ann_stored",
      "w_lm_score" -> "w_lm_stored",
      "w_decontaminate" -> "w_decontaminate_stored"
    ).foreach { case (built, stored) =>
      val a = graft.SparkEntry.queries(built)(spark, sf)
        .collect().map(_.toSeq).toSeq
      val b = graft.SparkEntry.queries(stored)(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(a.nonEmpty, s"$built returned no rows at smoke scale")
      assert(a == b, s"$stored diverged from $built")
    }
  }
}
