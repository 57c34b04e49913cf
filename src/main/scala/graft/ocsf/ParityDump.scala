package graft.ocsf

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.SparkSession
import graft.sources.FdrSource

/** Differential-parity dump: runs the full FDR → OCSF pipeline on a
  * fixture file of raw JSON lines and writes every route's normalized
  * rows as JSON-lines, one file per route.
  *
  * `tools/normalizer_diff.py` runs the REFERENCE loader
  * (/root/reference/src/python/qopcfdr_stream_loader.py, AWS clients
  * stubbed) on the same lines and diffs the two outputs field by
  * field — the machine check that [[Normalizers]] matches all 3,253
  * lines of reference semantics, not just the hand-picked golden
  * fields. NormalizerParitySpec wires both halves into `sbt test`.
  *
  * Usage: runMain graft.ocsf.ParityDump <fixtures.jsonl> <outDir>
  */
object ParityDump {

  /** Gzips `lines`, runs FdrSource + all 13 normalizers, writes
    * `<outDir>/<table_name>.jsonl` per route (empty routes get an
    * empty file so the differ sees explicit emptiness). */
  def dump(spark: SparkSession, lines: Seq[String], outDir: String): Unit = {
    val gzDir = Files.createTempDirectory("parity-gz")
    writeGz(gzDir, "fixtures.gz", lines)
    val classified = FdrSource.load(spark, gzDir.toString).cache()
    Files.createDirectories(Paths.get(outDir))
    Normalizers.normalizeAll(classified).foreach { case (route, df) =>
      val rows = df.toJSON.collect()
      Files.write(
        Paths.get(outDir, OcsfSink.tableName(route) + ".jsonl"),
        rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    classified.unpersist()
    ()
  }

  def writeGz(dir: Path, name: String, lines: Seq[String]): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(dir.resolve(name).toFile)), "UTF-8"))
    lines.foreach { l => w.write(l); w.write("\n") }
    w.close()
  }

  def main(args: Array[String]): Unit = {
    val fixtures = args(0)
    val outDir = args(1)
    val spark = graft.GraftSession.get()
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(Paths.get(fixtures))).asScala.toSeq
      .filter(_.trim.nonEmpty)
    dump(spark, lines, outDir)
    println(s"[parity] dumped 13 routes to $outDir")
    spark.stop()
  }
}
