package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level scale gates — properties that must hold across ALL of
  * main source, not just the queries PlanSpec pins individually.
  *
  * The one gate today: no UNPARTITIONED `Window.orderBy` over
  * corpus-sized data. An unpartitioned window is Spark's
  * single-partition sort — the whole input serialized through one
  * task — and every legitimate use in this engine runs over a BOUNDED
  * bucket-totals table (the two-phase decomposition of
  * [[graft.ops.Selection]] / `TextAnalysis.packShardsByCount`). Each
  * such use must carry a `bounded-global-window:` comment justifying
  * the bound within the six lines above it; an untagged
  * `Window.orderBy` fails this spec, so the next corpus-sized global
  * rank cannot land by accident (round 15 shipped exactly that in
  * t_dsir's selection window). */
class SourceGateSpec extends AnyFunSuite {

  private val mainRoot = new java.io.File("src/main/scala")

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = dir.listFiles().toSeq.partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
  }

  test("every unpartitioned Window.orderBy in main source is tagged bounded-global-window") {
    val pat = """Window\s*\.\s*orderBy""".r
    val offenders = scalaFiles(mainRoot).flatMap { f =>
      val text = scala.io.Source.fromFile(f, "UTF-8").mkString
      val lineStarts = 0 +: text.zipWithIndex.collect { case ('\n', i) => i + 1 }
      pat.findAllMatchIn(text).flatMap { m =>
        val lineIdx = lineStarts.lastIndexWhere(_ <= m.start)
        val lines = text.split("\n", -1)
        val line = lines(lineIdx).trim
        val inComment = line.startsWith("*") || line.startsWith("//") ||
          line.startsWith("/**")
        val tagged = lines.slice(math.max(0, lineIdx - 6), lineIdx)
          .exists(_.contains("bounded-global-window"))
        if (inComment || tagged) None
        else Some(s"${f.getPath}:${lineIdx + 1}: $line")
      }
    }
    assert(offenders.isEmpty,
      "unpartitioned Window.orderBy without a bounded-global-window " +
        "justification tag (single-partition sort of its input — bucket " +
        "it via graft.ops.Selection, or tag why the input is bounded):\n" +
        offenders.mkString("\n"))
  }
}
