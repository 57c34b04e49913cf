package graft.sources

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import graft.SparkSpec

/** Corrupt-input accounting: unparseable / keyless / unmapped lines
  * must land in the quarantine relation with a reason, not vanish. */
class FdrQuarantineSpec extends SparkSpec {

  test("loadWithQuarantine counts and classifies every skipped line") {
    val dir = Files.createTempDirectory("fdr-quarantine")
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(dir.resolve("b.gz").toFile)), "UTF-8"))
    Seq(
      // good, mapped
      """{"event_simpleName":"DnsRequest","name":"DnsRequestV4","aid":"a","cid":"c","id":"q-1","timestamp":"1700000001000","event_platform":"Mac","DomainName":"ok.example"}""",
      // malformed JSON (truncated)
      """{"event_simpleName":"DnsRequest","name":"Dns""",
      // not JSON at all
      """totally not json""",
      // parses but no event distinction key
      """{"name":"mystery","timestamp":"1700000006000"}""",
      // parses, has an event key, but unmapped event type
      """{"event_simpleName":"TotallyUnknownEvent","timestamp":"1700000005000"}"""
    ).foreach { l => w.write(l); w.write("\n") }
    w.close()

    val loaded = FdrSource.loadWithQuarantine(spark, dir.toString)
    assert(loaded.classified.count() == 1)

    val reasons = loaded.quarantined.collect()
      .map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(reasons == Map(
      "unparseable_json" -> 2,
      "missing_event_key" -> 1,
      "unmapped_event" -> 1), reasons.toString)

    // quarantine keeps the raw line for replay
    val raws = loaded.quarantined.collect().map(_.getString(0)).toSet
    assert(raws.contains("totally not json"))

    // classified output of the quarantine-aware path matches load()
    assert(FdrSource.load(spark, dir.toString).count() == 1)
  }
}
