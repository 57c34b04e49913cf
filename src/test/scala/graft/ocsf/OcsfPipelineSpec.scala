package graft.ocsf

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.FdrSource

/** End-to-end OCSF pipeline specs on a synthetic gz JSON-lines fixture
  * (A1–A23). Expected values are hand-derived from the reference
  * semantics (qopcfdr_stream_loader.py), not from running it. */
class OcsfPipelineSpec extends SparkSpec {

  /** Writes JSON lines gzipped, as FDR lands them in S3. */
  def writeGz(dir: Path, name: String, lines: Seq[String]): Unit = {
    val f = dir.resolve(name).toFile
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(f)), "UTF-8"))
    lines.foreach { l => w.write(l); w.write("\n") }
    w.close()
  }

  // 1700000000 s = 2023-11-14T22:13:20Z; 1700000000123 ms adds .123
  val fixtureLines = Seq(
    // ProcessRollup2: full process fields, ms timestamp, Win platform
    """{"event_simpleName":"ProcessRollup2","name":"ProcessRollup2V19","aid":"aid-1","cid":"cid-1","id":"evt-1","aip":"1.2.3.4","timestamp":"1700000000123","event_platform":"Win","ConfigBuild":"1007.3.0016606.11","ImageFileName":"\\Device\\HarddiskVolume3\\Windows\\System32\\cmd.exe","CommandLine":"cmd.exe /c whoami","SHA256HashData":"a1b2","MD5HashData":"c3d4","RawProcessId":"4242","SourceProcessId":"111","ParentProcessId":"222","ParentBaseFileName":"explorer.exe","ParentCommandLine":"explorer.exe","ExtraKey":"extra-value"}""",
    // NetworkConnectIP4 via event_type key (3-key coalesce), seconds ts
    """{"event_type":"NetworkConnectIP4","name":"NetworkConnectIP4V10","aid":"aid-2","cid":"cid-2","id":"evt-2","aip":"5.6.7.8","timestamp":"1700000000","event_platform":"Lin","LocalPort":"5555","RemotePort":"443","RemoteAddressIP4":"93.184.216.34","LocalAddressIP4":"10.0.0.5","ConnectionDirection":"0"}""",
    // DnsRequest via EventType key, Mac platform
    """{"EventType":"DnsRequest","name":"DnsRequestV4","aid":"aid-3","cid":"cid-3","id":"evt-3","timestamp":"1700000001000","event_platform":"Mac","DomainName":"example.com","ContextBaseFileName":"curl"}""",
    // UserLogon: logon type + admin
    """{"event_simpleName":"UserLogon","name":"UserLogonV10","aid":"aid-4","cid":"cid-4","id":"evt-4","timestamp":"1700000002000","event_platform":"Win","UserName":"alice","UserSid":"S-1-5-21","LogonType":"10","UserIsAdmin":"1"}""",
    // HttpRequest: method decimal 3 = Post; its status mapping is
    // "Unknown" (the 777 Override sentinel is on its ACTIVITY), so the
    // 404 does NOT flip its status
    """{"event_simpleName":"HttpRequest","name":"HttpRequestV1","aid":"aid-5","cid":"cid-5","id":"evt-5","timestamp":"1700000003000","event_platform":"Lin","HttpMethod":"3","HttpHost":"api.example.com","HttpPath":"/v1/things","HttpStatus":"404"}""",
    // HttpResponse: status mapping IS "Override" → 404 → Failure
    """{"event_simpleName":"HttpResponse","name":"HttpResponseV1","aid":"aid-5b","cid":"cid-5b","id":"evt-5b","timestamp":"1700000003500","event_platform":"Lin","HttpStatus":"404"}""",
    // Event_ExternalApiEvent: different shape, routed to extApi
    """{"event_simpleName":"Event_ExternalApiEvent","ExternalApiType":"Event_AuthActivityAuditEvent","UTCTimestamp":"1700000004","UserIp":"9.9.9.9","AgentIdString":"aid-6","cid":"cid-6","UserId":"user@example.com","CustomerIdString":"cust-1","AuditKeyValues":[{"Key":"request_method","ValueString":"GET"},{"Key":"status_code","ValueString":"200"},{"Key":"trace_id","ValueString":"trace-1"},{"Key":"request_path","ValueString":"/oauth2/token"}]}""",
    // unmapped event type → dropped
    """{"event_simpleName":"TotallyUnknownEvent","timestamp":"1700000005000"}""",
    // no event key at all → dropped
    """{"name":"mystery","timestamp":"1700000006000"}"""
  )

  lazy val tmpDir: Path = Files.createTempDirectory("fdr-fixture")
  lazy val classified = {
    writeGz(tmpDir, "part-0001.gz", fixtureLines)
    FdrSource.load(spark, tmpDir.toString).cache()
  }

  test("A1-A4: gz json-lines read, 3-key coalesce, 122-filter, routing") {
    assert(classified.count() == 7) // 9 lines - 1 unmapped - 1 keyless
    val names = classified.select("event_name").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(names == Set("ProcessRollup2", "NetworkConnectIP4", "DnsRequest",
      "UserLogon", "HttpRequest", "HttpResponse", "Event_ExternalApiEvent"))
    val routes = classified.select("route").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().toSet
    // extApi is its own route even though the JSON maps it to HTTP Activity
    assert(routes.contains(OcsfMappings.ExtApiRoute))
    assert(classified.filter(col("event_name") === "Event_ExternalApiEvent")
      .select("route").head().getString(0) == "extApi")
  }

  test("A5: epoch seconds-or-ms autodetect matches reference semantics") {
    val df = spark.range(1).select(
      Normalizers.epochToTimestamp(lit("1700000000")).cast("string").as("s"),
      Normalizers.epochToTimestamp(lit("1700000000123")).cast("string").as("ms"),
      Normalizers.epochToTimestamp(lit("893383659000")).cast("string").as("dflt"))
    val r = df.head()
    assert(r.getString(0) == "2023-11-14 22:13:20")
    assert(r.getString(1) == "2023-11-14 22:13:20.123")
    assert(r.getString(2) == "1998-04-24 02:07:39") // reference's default sentinel
  }

  test("A11: process activity normalization") {
    val out = Normalizers.processActivity(
      classified.filter(col("route") === "Process Activity"))
    val r = out.head()
    assert(out.count() == 1)
    assert(r.getAs[String]("class_name") == "Process Activity")
    assert(r.getAs[Int]("class_uid") == 1007)
    assert(r.getAs[Int]("activity_id") == 3)     // ProcessRollup2 → Open
    assert(r.getAs[Int]("type_uid") == 100703)   // 1007*100+3
    assert(r.getAs[String]("type_name") == "Process Activity: Open")
    val proc = r.getAs[org.apache.spark.sql.Row]("process")
    assert(proc.getAs[Long]("pid") == 4242L)
    assert(proc.getAs[String]("uid") == "111")
    assert(proc.getAs[org.apache.spark.sql.Row]("file").getAs[String]("name").endsWith("cmd.exe"))
    val device = r.getAs[org.apache.spark.sql.Row]("device")
    assert(device.getAs[org.apache.spark.sql.Row]("os").getAs[Int]("type_id") == 100)
    // unmapped keeps only unconsumed keys (the reference never strips
    // the event-name key itself, so it stays too)
    val unmapped = r.getAs[Map[String, String]]("unmapped")
    assert(unmapped.keySet == Set("event_simpleName", "ExtraKey"))
    // observables: 7 process + 3 device = 10 present values
    assert(r.getAs[scala.collection.Seq[_]]("observables").size == 10)
  }

  test("A12: network activity direction/protocol normalization") {
    val r = Normalizers.networkActivity(
      classified.filter(col("route") === "Network Activity")).head()
    val ci = r.getAs[org.apache.spark.sql.Row]("connection_info")
    assert(ci.getAs[String]("direction") == "Outbound")
    assert(ci.getAs[Int]("direction_id") == 2)
    assert(ci.getAs[String]("protocol_ver") == "Internet Protocol version 4 (IPv4)")
    val dst = r.getAs[org.apache.spark.sql.Row]("dst_endpoint")
    assert(dst.getAs[String]("ip") == "93.184.216.34")
    assert(dst.getAs[Int]("port") == 443)
    val srcOs = r.getAs[org.apache.spark.sql.Row]("src_endpoint")
      .getAs[org.apache.spark.sql.Row]("os")
    assert(srcOs.getAs[Int]("type_id") == 200) // Lin
  }

  test("A15: dns activity keeps ContextBaseFileName in unmapped") {
    val r = Normalizers.dnsActivity(
      classified.filter(col("route") === "DNS Activity")).head()
    assert(r.getAs[org.apache.spark.sql.Row]("query").getAs[String]("hostname") == "example.com")
    assert(r.getAs[Map[String, String]]("unmapped").contains("ContextBaseFileName"))
    assert(r.getAs[Int]("class_uid") == 4003)
  }

  test("A16: authentication logon type / admin user type") {
    val r = Normalizers.authentication(
      classified.filter(col("route") === "Authentication")).head()
    assert(r.getAs[String]("logon_type") == "Remote Interactive")
    assert(r.getAs[Int]("logon_type_id") == 10)
    val user = r.getAs[org.apache.spark.sql.Row]("user")
    assert(user.getAs[String]("name") == "alice")
    assert(user.getAs[Int]("type_id") == 2) // admin
    assert(r.getAs[Int]("activity_id") == 1) // UserLogon → Logon
    // reference quirk: LogonType is read but never deleted (py:2245),
    // so it stays in unmapped
    assert(r.getAs[Map[String, String]]("unmapped").contains("LogonType"))
  }

  test("A10: http activity method decode + status override") {
    val out = Normalizers.httpActivity(
      classified.filter(col("route") === "HTTP Activity"))
    val byName = out.collect().map(r => r.getAs[org.apache.spark.sql.Row]("metadata")
      .getAs[String]("log_name") -> r).toMap
    val req = byName("HttpRequest")
    assert(req.getAs[String]("activity_name") == "Post")
    assert(req.getAs[Int]("activity_id") == 6)
    // HttpRequest's status mapping is "Unknown", not "Override" → 404
    // does not flip it (faithful to py:1312-1325)
    assert(req.getAs[String]("status") == "Unknown")
    val hr = req.getAs[org.apache.spark.sql.Row]("http_request")
    assert(hr.getAs[String]("http_method") == "POST")
    assert(hr.getAs[org.apache.spark.sql.Row]("url").getAs[String]("hostname") == "api.example.com")
    // HttpStatus stays in unmapped (reference never dels it)
    assert(req.getAs[Map[String, String]]("unmapped").contains("HttpStatus"))
    val resp = byName("HttpResponse")
    assert(resp.getAs[String]("status") == "Failure") // Override + 404
    assert(resp.getAs[Int]("status_id") == 2)
    assert(resp.getAs[Int]("activity_id") == 0) // mapping: Unknown
  }

  test("extApi: AuditKeyValues extraction on the 13th route") {
    val r = Normalizers.externalApiEvent(
      classified.filter(col("route") === OcsfMappings.ExtApiRoute)).head()
    assert(r.getAs[String]("activity_name") == "Get")
    assert(r.getAs[Int]("activity_id") == 3)
    assert(r.getAs[String]("status") == "Success") // 200
    assert(r.getAs[String]("message") == "Event_AuthActivityAuditEvent")
    val meta = r.getAs[org.apache.spark.sql.Row]("metadata")
    assert(meta.getAs[String]("uid") == "trace-1")
    val src = r.getAs[org.apache.spark.sql.Row]("src_endpoint")
    assert(src.getAs[String]("ip") == "9.9.9.9")
    assert(src.getAs[org.apache.spark.sql.Row]("owner")
      .getAs[org.apache.spark.sql.Row]("account").getAs[String]("uid") == "cust-1")
  }

  test("A22-A23: Security-Lake layout fan-out") {
    val outDir = Files.createTempDirectory("ocsf-out")
    OcsfSink.fanOut(classified, outDir.toString, "us-east-1", "123456789012")
    val process = outDir.resolve("process_activity")
      .resolve("region=us-east-1").resolve("accountId=123456789012")
      .resolve("eventDay=20231114")
    assert(Files.exists(process), s"expected $process")
    // re-read round-trips
    val back = spark.read.parquet(outDir.resolve("process_activity").toString)
    assert(back.count() == 1)
    // partition inference types eventDay as int on read-back
    assert(back.select(col("eventDay").cast("string")).head().getString(0) == "20231114")
    // one file per partition (repartition before partitionBy)
    val files = Files.list(process).toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(files.length == 1, s"expected 1 file, got ${files.length}")
  }

  test("A23: routeClustered confines each route to tasksPerRoute partitions, loses nothing") {
    val clustered = OcsfSink.routeClustered(classified, tasksPerRoute = 2)
    assert(clustered.rdd.getNumPartitions == graft.ocsf.OcsfMappings.routes.size * 2)
    assert(clustered.count() == classified.count())
    // hash partitioning on (route, salt∈[0,2)) → each route meets at
    // most 2 partitions, so a route-filtered rescan of the cache can
    // prune everything else via per-batch stats
    import org.apache.spark.sql.functions.{countDistinct, spark_partition_id}
    val spread = clustered
      .withColumn("pid", spark_partition_id()) // project first: not allowed inside agg
      .groupBy(col("route"))
      .agg(countDistinct(col("pid")).as("parts"))
      .agg(org.apache.spark.sql.functions.max(col("parts"))).head().getLong(0)
    assert(spread <= 2, s"a route spans $spread partitions, expected <= 2")
    // fan-out from the clustered relation lands the same rows
    val outDir = Files.createTempDirectory("ocsf-out-clustered")
    OcsfSink.fanOut(clustered, outDir.toString, "us-east-1", "123456789012")
    val back = spark.read.parquet(outDir.resolve("process_activity").toString)
    assert(back.count() == 1)
  }

  test("A22: rows land time-sorted within each file (row-group pruning stats)") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("ocsf-sorted")
    // deliberately out of order within one day
    val times = Seq("2023-11-14 18:00:00", "2023-11-14 06:00:00",
      "2023-11-14 12:00:00", "2023-11-14 01:00:00")
    val df = times.zipWithIndex.toDF("t", "i")
      .select(struct(concat(lit("u"), col("i")).as("uid")).as("metadata"),
        to_timestamp(col("t")).as("time"))
    OcsfSink.write(df, outDir.toString, "DNS Activity", "us-east-1",
      "123456789012", filesPerDay = 1)
    val day = outDir.resolve("dns_activity")
      .resolve("region=us-east-1").resolve("accountId=123456789012")
      .resolve("eventDay=20231114")
    val files = Files.list(day).toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(files.length == 1)
    // parquet preserves row order within a file: ascending time means
    // tight per-row-group min/max stats for time-range skipping
    val back = spark.read.parquet(files.head)
      .select(col("time").cast("string")).collect().map(_.getString(0)).toSeq
    assert(back == back.sorted, s"rows must be time-ascending, got $back")
  }

  test("A22: filesPerDay auto-derives from plan size, 1 for tiny inputs") {
    val df = Normalizers.processActivity(
      classified.filter(col("route") === "Process Activity"))
    assert(OcsfSink.autoFilesPerDay(df) == 1)
    // a 1 KB chunk target forces fan-out even on the fixture
    assert(OcsfSink.autoFilesPerDay(df, targetChunkBytes = 1024) > 1)
  }

  test("A22: salted write spreads a hot day across filesPerDay files") {
    val outDir = Files.createTempDirectory("ocsf-salted")
    OcsfSink.write(
      Normalizers.processActivity(classified.filter(col("route") === "Process Activity")),
      outDir.toString, "Process Activity", "us-east-1", "123456789012",
      filesPerDay = 3)
    val day = outDir.resolve("process_activity")
      .resolve("region=us-east-1").resolve("accountId=123456789012")
      .resolve("eventDay=20231114")
    assert(Files.exists(day))
    // 1 row can't fill 3 files, but layout must be unchanged and readable
    val back = spark.read.parquet(outDir.resolve("process_activity").toString)
    assert(back.count() == 1)
    assert(!back.columns.contains("salt"), "salt must not leak into the schema")
  }

  test("lake read-back: OcsfTables registers views and SQL prunes partitions") {
    val outDir = Files.createTempDirectory("ocsf-lake")
    OcsfSink.fanOut(classified, outDir.toString, "eu-west-1", "000011112222")
    val views = OcsfTables.registerAll(spark, outDir.toString)
    assert(views.contains("ocsf_dns_activity"), views.toString)
    val n = spark.sql(
      """SELECT count(*) FROM ocsf_dns_activity
        |WHERE eventDay = 20231114 AND class_uid = 4003""".stripMargin)
      .head().getLong(0)
    assert(n == 1)
    // the partition filter must prune, not post-filter: PartitionFilters
    val plan = spark.sql(
      "SELECT * FROM ocsf_dns_activity WHERE eventDay = 20231114")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(eventDay"), plan)
  }

  test("normalizeAll covers all 13 routes") {
    val all = Normalizers.normalizeAll(classified)
    assert(all.keySet.size == 13)
    assert(all.keySet == OcsfMappings.routes.toSet)
    // every route's plan is executable even when empty
    all.foreach { case (_, df) => df.count() }
  }

  test("A23: fan-out admission control staggers only oversized batches") {
    val G = 1L << 30; val M = 1L << 20
    def admit(heap: Long, cached: Long, batch: Long, fpd: Int = 3) =
      OcsfSink.admittedRoutes(heap, cached, rowGroupBytes = 128 * M,
        batchBytes = BigInt(batch), filesPerDay = fpd, nRoutes = 13)
    // the steady 1M-event bench shape: small batch, admission is a
    // no-op — all 13 routes run wide (the 86-102k ev/s path must not
    // regress from this lever existing)
    assert(admit(8 * G, 200 * M, 150 * M) == 13)
    // the 4M/8g serialized-cache shape (149k ev/s): still full width
    assert(admit(8 * G, 600 * M, 600 * M) == 13)
    // the 32M/8g cliff (BASELINE.md r12: OOM in ParquetWriteSupport):
    // ~2.4 g pool-pinned cache + a multi-GB batch must stagger hard
    val cliff = admit(8 * G, (2.4 * G).toLong, 6 * G)
    assert(cliff >= 1 && cliff <= 3, s"cliff shape admitted $cliff routes")
    // same corpus on a 24 g heap: wide again (the clean-run shape)
    assert(admit(24 * G, 5 * G, 6 * G) >= 7)
    // floors: a saturated storage pool still admits at least one route
    assert(admit(8 * G, 8 * G, 32 * G) == 1)
    // and the cap never exceeds the route count
    assert(admit(512 * G, 0, 1 * M) == 13)
    // the live wrapper agrees with the pure arithmetic on a real frame
    val width = OcsfSink.autoConcurrentRoutes(classified, filesPerDay = 3,
      nRoutes = 13)
    assert(width >= 1 && width <= 13)
  }
}
