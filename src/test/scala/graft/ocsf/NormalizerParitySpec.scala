package graft.ocsf

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.sys.process._
import graft.SparkSpec

/** Differential parity gate: the Spark normalizers must match the
  * ACTUAL reference loader (qopcfdr_stream_loader.py, AWS stubbed)
  * field-by-field on every fixture event, for all 13 routes, modulo
  * only the declared divergences documented in [[Normalizers]] /
  * tools/normalizer_diff.py.
  *
  * This is the machine check behind every hand-derived golden: the
  * fixtures in fdr_parity_fixtures.jsonl cover every route plus the
  * branchy corners (timestamp sentinel, IPv4/IPv6 and file-name
  * fallback dels, Override status sentinel, logon decodes, unknown
  * platforms, falsy values).
  *
  * Skips (rather than fails) when python3 or the reference checkout is
  * unavailable, so the suite still runs in stripped environments.
  */
class NormalizerParitySpec extends SparkSpec {

  def runParity(fixtureFile: String, expectAllRoutes: Boolean): Unit = {
    val refLoader = Paths.get("/root/reference/src/python/qopcfdr_stream_loader.py")
    val fixtures = Paths.get(fixtureFile)
    assume(Files.exists(refLoader), "reference checkout not present")
    assume(Files.exists(fixtures), "fixtures missing")
    assume(Process(Seq("python3", "--version")).!(ProcessLogger(_ => ())) == 0,
      "python3 not available")

    val lines = Files.readAllLines(fixtures).asScala.toSeq.filter(_.trim.nonEmpty)
    val outDir = Files.createTempDirectory("parity-spec").toString
    ParityDump.dump(spark, lines, outDir)

    val output = new StringBuilder
    val exit = Process(
      Seq("python3", "tools/normalizer_diff.py", fixtures.toString, outDir))
      .!(ProcessLogger(l => { output.append(l).append('\n'); () }))
    assert(exit == 0, s"undeclared divergences vs reference loader:\n$output")
    if (expectAllRoutes)
      assert(output.toString.contains("routes: 13"), output.toString)
  }

  test("all 13 normalizers match the reference loader field-by-field") {
    runParity("src/test/resources/fdr_parity_fixtures.jsonl", expectAllRoutes = true)
  }

  test("fuzz corpus: random key subsets match the reference loader") {
    // 260 generated events (tools/parity_fuzz.py, seed 7) exercising
    // the get/del branch combinatorics: random key subsets, empty
    // strings, odd platforms, missing timestamps. extApi has its own
    // payload shape and is covered by the curated corpus.
    runParity("src/test/resources/fdr_parity_fuzz.jsonl", expectAllRoutes = false)
  }
}
