package graft.streaming

import graft.QueryDef
import graft.model.Tables.table
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** The frozen naive-Bayes classifier artifact: per-token per-class
  * counts plus the class table — everything
  * [[graft.ops.Classify.nbPredict]]'s scoring stage reads, collected
  * once and broadcast, so arrivals classify without rescanning the
  * training corpus. `classes` is sorted (the alphabetical argmin
  * tie-break is an array-order scan), `dd(c) = n_toks_c + vocab` is
  * the smoothed denominator, `priorBits(c) = bits(n_docs_c, n_docs)`. */
case class NbModel(
    classes: Array[String],
    priorBits: Array[Long],
    dd: Array[Long],
    counts: Map[String, Array[Long]])

/** ONLINE trained-NB classification — the serving twin of
  * `t_classify_nb`, same shape as the LM/DSIR/excess scorers: the
  * batch phase trains the count model (one aggregation pass, loudly
  * capped collect), serving is a stateless per-row map against the
  * broadcast artifact — batch == stream by construction, and the JVM
  * bits loop is the exact `floor(log2(d/n))` the column algebra and
  * the DuckDB oracle compute, so the served predictions are
  * bit-identical to the batch operator's rows for the same ids. */
object ClassifyServe {

  /** Collect the NB model. The require bounds the broadcast: vocab
    * past the cap means the artifact no longer fits serving executors
    * — prune the vocabulary (min-count threshold) or switch the token
    * key to hashed features (the [[graft.ops.Dsir]] move) before
    * raising it. */
  def buildNbModel(
      docs: DataFrame, docId: Column, text: Column, label: Column,
      maxVocab: Int = 4000000): NbModel = {
    import docs.sparkSession.implicits._
    val toks = docs.select(label.as("lab"),
      graft.functions.TextShingles.wordTokens(text).as("toks"))
    val cls = toks.groupBy($"lab").agg(
        count(lit(1)).as("n_docs_s"),
        sum(size($"toks")).cast("long").as("n_toks_s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val classes = cls.map(_._1)
    val idx = classes.zipWithIndex.toMap
    val nDocs = cls.map(_._2).sum
    val tok = toks.select($"lab", explode($"toks").as("w"))
    val vocab = tok.agg(count_distinct($"w")).head().getLong(0)
    require(vocab <= maxVocab,
      s"NB model vocabulary $vocab exceeds the $maxVocab broadcast cap — " +
        s"prune rare tokens or hash features before collecting")
    def jb(n: Long, d: Long): Long = {
      var k = 0L
      while ((n << (k + 1)) <= d) k += 1
      k
    }
    val priorBits = cls.map(c => jb(c._2, nDocs))
    val dd = cls.map(c => c._3 + vocab)
    val counts = tok.groupBy($"w", $"lab").agg(count(lit(1)).as("cws"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) =>
        val arr = Array.fill(classes.length)(0L)
        rows.foreach(r => arr(idx(r.getString(1))) = r.getLong(2))
        w -> arr
      }
    NbModel(classes, priorBits, dd, counts)
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("pred_lang", StringType, nullable = false),
    StructField("bits_best", LongType, nullable = false)))

  /** Classify each row of a batch OR streaming frame against the
    * frozen model: per-occurrence integer-bit surprisals summed per
    * class (OOV tokens smooth to count 0 — exactly the batch form's
    * left-join coalesce), argmin with the alphabetical tie-break.
    * Zero-token documents emit nothing (no evidence — the batch
    * contract). Stateless map, batch == stream. */
  def withOnlineNbPredict(
      docs: DataFrame, id: Column, text: Column,
      model: NbModel): DataFrame = {
    val bModel = docs.sparkSession.sparkContext.broadcast(model)
    val prepped = docs.select(id.as("__id"),
      graft.functions.TextShingles.wordTokens(text).as("__toks"))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    prepped.mapPartitions { rows =>
      val m = bModel.value
      val k = m.classes.length
      rows.flatMap { r =>
        val toks = r.getSeq[String](1)
        if (toks.isEmpty) Iterator.empty
        else {
          val tot = m.priorBits.clone()
          toks.foreach { w =>
            val cw = m.counts.getOrElse(w, null)
            var c = 0
            while (c < k) {
              val n = (if (cw == null) 0L else cw(c)) + 1L
              val d = m.dd(c)
              var b = 0L
              while ((n << (b + 1)) <= d) b += 1
              tot(c) += b
              c += 1
            }
          }
          var best = 0
          var c = 1
          while (c < k) { // strict < keeps the alphabetically first tie
            if (tot(c) < tot(best)) best = c
            c += 1
          }
          Iterator.single(Row(r.getLong(0), m.classes(best), tot(best)))
        }
      }
    }(enc)
  }

  val queries: Seq[QueryDef] = Seq(

    // Online NB classification under batch execution: the model
    // trained on the FULL corpus, the first 100 ids replayed as
    // arrivals. Every arrival is in-corpus, so predictions are
    // exactly t_classify_nb's rows for those ids — the oracle is the
    // batch replay restricted, holding the JVM scorer to bit-equality
    // with the column-algebra form.
    QueryDef(
      "w_classify_nb",
      (s, d) => {
        import s.implicits._
        val docs = table(s, d, "documents")
        val model = buildNbModel(docs, $"doc_id", $"text", $"lang")
        withOnlineNbPredict(docs.filter($"doc_id" < 100), $"doc_id", $"text", model)
          .orderBy($"doc_id")
      },
      Some(s"""WITH ${graft.ops.Classify.nbCtes}
              SELECT doc_id, lab AS pred_lang,
                     CAST(total AS BIGINT) AS bits_best
              FROM nbr WHERE rk = 1 AND doc_id < 100 ORDER BY doc_id"""))
  )
}
