package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source lint: driver-side materialization is the one scale-killer a
  * plan inspection can miss (it is invisible in `.explain`), so every
  * `.collect()`-family call in ENGINE code must be on the whitelist
  * below — each entry is a bounded artifact, not a dataflow edge. A
  * new operator that quietly collects an unbounded intermediate fails
  * this suite with the offending file:line (VERDICT r8 ask #7).
  *
  * Whitelisted sites (all bounded by construction):
  *  - LlmOps.scala — 6: max-chunk-length scalar (:289), 16 k-means
  *    centroids (:809), IVF centroid rows (:926), 128-row PQ codebook
  *    (:952), BPE distinct-pair head (:2092), ≤8-row BPE merge table
  *    (:2143).
  *  - Eval.scala — 1: the 20-candidate MMR pool (:178); MMR selection
  *    is sequential by definition.
  *  - sources/Sources.scala — 1: flagged file-group ids for delete
  *    compaction (:423) — one id per file GROUP, O(files/corpus), the
  *    same driver-side planning every table format's compactor does.
  *
  * Harness files (measurement/CLI, not engine dataflow) are exempt by
  * name: Omits (omit measurements), Query (CLI printer, limit-bounded),
  * Verify/Bench/Profile/Scale (driver-contract harnesses). The oracle
  * twins (graft/oracle) contain SQL strings, not Spark calls.
  */
class LintSpec extends AnyFunSuite {

  private val root = {
    val f = new java.io.File("src/main/scala/graft")
    assert(f.isDirectory, s"source root not found from ${new java.io.File(".").getAbsolutePath}")
    f
  }

  /** file name -> allowed number of driver-materialization call sites */
  private val whitelist: Map[String, Int] = Map(
    "LlmOps.scala" -> 6,
    "Eval.scala" -> 1,
    "Sources.scala" -> 1)

  private val harnessExempt = Set(
    "Omits.scala", "Query.scala", "Verify.scala", "Bench.scala",
    "Profile.scala", "Scale.scala")

  private val patterns = Seq(".collect()", "collectAsList(", "toLocalIterator")

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = dir.listFiles.toSeq.partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
  }

  test("no driver-side collect outside the documented bounded sites") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    scalaFiles(root).filterNot(f => harnessExempt(f.getName)).foreach { f =>
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      var hits = 0
      (0 until lines.size()).foreach { i =>
        val code = lines.get(i).trim
        // strip doc/comment lines so prose mentioning collect() doesn't count
        val isComment = code.startsWith("*") || code.startsWith("//") ||
          code.startsWith("/*")
        if (!isComment && patterns.exists(code.contains)) {
          hits += 1
          if (hits > whitelist.getOrElse(f.getName, 0))
            offenders += s"${f.getPath}:${i + 1}: $code"
        }
      }
      val allowed = whitelist.getOrElse(f.getName, 0)
      assert(hits <= allowed,
        s"${f.getName}: $hits driver-materialization sites, whitelist allows $allowed:\n" +
          offenders.mkString("\n"))
      // a whitelist entry larger than reality is stale — tighten it
      if (whitelist.contains(f.getName))
        assert(hits === allowed,
          s"${f.getName}: whitelist allows $allowed but only $hits found — tighten the whitelist")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no RDD-level collect or unbounded driver loop primitives in engine code") {
    // rdd.collect / rdd.toLocalIterator bypass the SQL layer entirely;
    // none are whitelisted anywhere in engine code
    val bad = scalaFiles(root)
      .filterNot(f => harnessExempt(f.getName))
      .flatMap { f =>
        val lines = java.nio.file.Files.readAllLines(f.toPath)
        (0 until lines.size()).flatMap { i =>
          val code = lines.get(i).trim
          val isComment = code.startsWith("*") || code.startsWith("//")
          if (!isComment && (code.contains(".rdd.collect") ||
              code.contains("collectPartitions")))
            Some(s"${f.getPath}:${i + 1}: $code")
          else None
        }
      }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
