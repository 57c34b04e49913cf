package graft.ocsf

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.FdrSource

/** Golden-row specs for the normalizers not covered by
  * OcsfPipelineSpec: File System (A13), Module (A14), Application
  * Lifecycle (A17), OS Patch State (A18), File Hosting (A19),
  * Detection Finding (A20), Device Config State (A21). Expected values
  * hand-derived from qopcfdr_stream_loader.py semantics. */
class NormalizerGoldenSpec extends SparkSpec {

  def writeGz(dir: Path, name: String, lines: Seq[String]): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(dir.resolve(name).toFile)), "UTF-8"))
    lines.foreach { l => w.write(l); w.write("\n") }
    w.close()
  }

  val fixtureLines = Seq(
    // A13 File System: directory write → type Folder; hash fallback key
    """{"event_simpleName":"NewScriptWritten","name":"NewScriptWrittenV1","aid":"a-fs","cid":"c-fs","id":"e-fs","timestamp":"1700000010000","event_platform":"Lin","TargetFileName":"/tmp/evil.sh","TargetDirectoryName":"/tmp","UserName":"mallory","ContentSHA256HashData":"feed"}""",
    // A14 Module: mac kext with BundleID
    """{"event_simpleName":"KextLoad","name":"KextLoadV1","aid":"a-mod","cid":"c-mod","id":"e-mod","timestamp":"1700000011000","event_platform":"Mac","BundleID":"com.example.kext","ImageFileName":"/Library/Extensions/e.kext","SHA256HashData":"s2","SHA1HashData":"s1","MD5HashData":"m5"}""",
    // A17 App Lifecycle: UpdateFlag 3 = Install/Success
    """{"event_simpleName":"InstalledApplication","name":"InstalledApplicationV1","aid":"a-app","cid":"c-app","id":"e-app","timestamp":"1700000012000","event_platform":"Win","UpdateFlag":"3","AppName":"7-Zip","AppSource":"msi","AppVendor":"Igor Pavlov","AppVersion":"23.01"}""",
    // A18 Patch State: Status 0 = Install/Success, multi-valued KB list
    """{"event_simpleName":"InstalledUpdates","name":"InstalledUpdatesV1","aid":"a-kb","cid":"c-kb","id":"e-kb","timestamp":"1700000013000","event_platform":"Win","Status":"0","InstalledUpdateIds":"KB500001;KB500002;KB500003"}""",
    // A19 File Hosting: download with server+port
    """{"event_simpleName":"LFODownloadConfirmation","name":"LFODownloadConfirmationV1","aid":"a-fh","cid":"c-fh","id":"e-fh","timestamp":"1700000014000","event_platform":"Win","SourceFileName":"payload.bin","SHA256HashData":"dead","DownloadServer":"lfo.example.com","DownloadPort":"443"}""",
    // A20 Detection Finding: full process ancestry
    """{"event_simpleName":"ScriptControlDetectInfo","name":"ScriptControlDetectInfoV1","aid":"a-det","cid":"c-det","id":"e-det","timestamp":"1700000015000","event_platform":"Win","ImageFileName":"powershell.exe","CommandLine":"powershell -enc AAA","ContentSHA256HashData":"beef","ContextProcessId":"999","ParentImageFileName":"cmd.exe","GrandparentImageFileName":"explorer.exe","GrandparentCommandLine":"explorer.exe"}""",
    // A21 Device Config: tampering event, High severity, Unknown status
    """{"event_simpleName":"SensorTampering","name":"SensorTamperingV1","aid":"a-dc","cid":"c-dc","id":"e-dc","aip":"8.8.4.4","timestamp":"1700000016000","event_platform":"Win","ConfigBuild":"1007.x","TamperType":"uninstall"}"""
  )

  lazy val classified = {
    val dir = Files.createTempDirectory("fdr-golden")
    writeGz(dir, "batch.gz", fixtureLines)
    FdrSource.load(spark, dir.toString).cache()
  }

  def one(route: String): Row =
    Normalizers.byRoute(route)(classified.filter(col("route") === route)).head()

  test("A13: file system activity — folder type, creator, hash fallback") {
    val r = one("File System Activity")
    assert(r.getAs[Int]("class_uid") == 1001)
    assert(r.getAs[Int]("severity_id") == 2) // NewScriptWritten → Low
    val f = r.getAs[Row]("file")
    assert(f.getAs[String]("name") == "/tmp/evil.sh")
    assert(f.getAs[String]("path") == "/tmp")
    assert(f.getAs[Int]("type_id") == 2 && f.getAs[String]("type") == "Folder")
    assert(f.getAs[Row]("creator").getAs[String]("name") == "mallory")
    // ContentSHA256HashData is the fallback source for hashes[0]
    assert(f.getAs[scala.collection.Seq[Row]]("hashes").head.getAs[String]("value") == "feed")
    assert(r.getAs[Int]("activity_id") == 1) // Create
  }

  test("A14: module activity — bundle id, 3 hash algorithms") {
    val r = one("Module Activity")
    assert(r.getAs[Int]("class_uid") == 1005)
    val m = r.getAs[Row]("module")
    assert(m.getAs[String]("function_name") == "com.example.kext")
    assert(m.getAs[Int]("load_type_id") == 1 && m.getAs[String]("load_type") == "Standard")
    val hashes = m.getAs[Row]("file").getAs[scala.collection.Seq[Row]]("hashes")
    assert(hashes.map(h => h.getAs[Int]("algorithm_id") -> h.getAs[String]("value")).toSet ==
      Set(3 -> "s2", 2 -> "s1", 1 -> "m5"))
    assert(r.getAs[Row]("device").getAs[Row]("os").getAs[Int]("type_id") == 300) // Mac
  }

  test("A17: application lifecycle — UpdateFlag 3 → Install/Success") {
    val r = one("Application Lifecycle")
    assert(r.getAs[Int]("class_uid") == 6002)
    assert(r.getAs[Int]("activity_id") == 1 && r.getAs[String]("activity_name") == "Install")
    assert(r.getAs[Int]("status_id") == 1 && r.getAs[String]("status") == "Success")
    val app = r.getAs[Row]("app")
    assert(app.getAs[String]("name") == "7-Zip")
    assert(app.getAs[String]("vendor_name") == "Igor Pavlov")
    assert(app.getAs[String]("version") == "23.01")
    assert(r.getAs[Int]("type_uid") == 600201)
  }

  test("A18: os patch state — status decode and ;-split KB list") {
    val r = one("Operating System Patch State")
    assert(r.getAs[Int]("class_uid") == 5004)
    assert(r.getAs[String]("activity_name") == "Install")
    assert(r.getAs[String]("status") == "Success")
    val kbs = r.getAs[scala.collection.Seq[Row]]("kb_article_list").map(_.getAs[String]("uid"))
    assert(kbs == Seq("KB500001", "KB500002", "KB500003"))
  }

  test("A19: file hosting — download endpoint and file hash") {
    val r = one("File Hosting Activity")
    assert(r.getAs[Int]("class_uid") == 6006)
    assert(r.getAs[Int]("activity_id") == 2) // Download
    val dst = r.getAs[Row]("dst_endpoint")
    assert(dst.getAs[String]("hostname") == "lfo.example.com")
    assert(dst.getAs[Int]("port") == 443)
    val f = r.getAs[Row]("file")
    assert(f.getAs[String]("name") == "payload.bin")
    assert(f.getAs[scala.collection.Seq[Row]]("hashes").head.getAs[String]("value") == "dead")
  }

  test("A20: detection finding — 3-level process ancestry in evidences") {
    val r = one("Detection Finding")
    assert(r.getAs[Int]("class_uid") == 2004)
    assert(r.getAs[Int]("severity_id") == 3) // Medium
    val proc = r.getAs[scala.collection.Seq[Row]]("evidences").head.getAs[Row]("process")
    assert(proc.getAs[Row]("file").getAs[String]("name") == "powershell.exe")
    assert(proc.getAs[String]("cmd_line") == "powershell -enc AAA")
    assert(proc.getAs[String]("uid") == "999")
    val parent = proc.getAs[Row]("parent_process")
    assert(parent.getAs[Row]("file").getAs[String]("name") == "cmd.exe")
    // reference quirk: parent cmd_line is always null (re-gets consumed key)
    assert(parent.getAs[String]("cmd_line") == null)
    val gp = parent.getAs[Row]("parent_process")
    assert(gp.getAs[Row]("file").getAs[String]("name") == "explorer.exe")
    assert(gp.getAs[String]("cmd_line") == "explorer.exe")
  }

  test("A21: device config state — severity/status from mapping, unmapped remainder") {
    val r = one("Device Config State")
    assert(r.getAs[Int]("class_uid") == 5002)
    assert(r.getAs[Int]("severity_id") == 4) // SensorTampering → High
    assert(r.getAs[Int]("status_id") == 0 && r.getAs[String]("status") == "Unknown")
    assert(r.getAs[Int]("category_uid") == 5) // Discovery
    val dev = r.getAs[Row]("device")
    assert(dev.getAs[String]("ip") == "8.8.4.4")
    assert(dev.getAs[scala.collection.Seq[Row]]("agent_list").head
      .getAs[String]("version") == "1007.x") // ConfigBuild
    val unmapped = r.getAs[Map[String, String]]("unmapped")
    assert(unmapped.contains("TamperType")) // class consumes nothing extra
    assert(!unmapped.contains("ConfigBuild"))
  }
}
