package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** A28 — manifest-fed exactly-once streaming source over the landing
  * prefix (`format("graft-landing")`): discovery by NOTIFICATION, not
  * by listing.
  *
  * The reference never lists its bucket: S3 event notifications flow
  * through SQS and the loader consumes the queue
  * (/root/reference/README.md:34-38). Spark's file source re-discovers
  * by LISTING the prefix every trigger and diffing against a seen-files
  * map persisted in the checkpoint — O(all files ever landed) LIST +
  * an unbounded map, every 10 s. At 100 TB/day (~10⁶ objects/day)
  * that listing tax IS the ingest bottleneck. This source plans each
  * micro-batch from [[LandingLog]] instead: per-trigger driver work is
  * O(unconsumed notifications) and the checkpoint state is one tiny
  * per-writer (seq, idx) high-water offset — both track the ingest
  * delta, like the queue they re-express.
  *
  * Exactly-once: the offset is the per-writer position in the
  * notification log. A batch's file set is a PURE function of the
  * (start, end] offset range — Spark checkpoints the range, so a
  * crashed batch replays byte-identical input into the idempotent
  * sink. Notification-log compaction preserves record identity
  * ([[LandingLog.compact]]), so offsets survive it.
  *
  * Admission control: `maxFilesPerTrigger` (default 64) bounds each
  * batch's object count (one gz object = one unsplittable task, the
  * file-source analog). Backlog — announced-but-unconsumed objects —
  * is visible to the progress reporter via `reportLatestOffset`.
  *
  * A data file that vanishes between announce and read THROWS
  * (notification integrity — silent skip is invisible data loss);
  * `ignoreMissingFiles=true` opts into skip-and-continue for
  * lifecycle-expired backfills. */
class LandingSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-landing"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LandingSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LandingTable(new CaseInsensitiveStringMap(properties))
}

object LandingSource {
  /** raw = one landed JSON line; src_file = the object it came from
    * (provenance — the reference logs the S3 key per Lambda invoke). */
  val schema: StructType = StructType(Seq(
    StructField("raw", StringType, nullable = false),
    StructField("src_file", StringType, nullable = false)))

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-landing requires .option(\"path\", <landingDir>) or load(<landingDir>)")
    p
  }
}

private[sources] class LandingTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val path = LandingSource.pathOf(options)
  override def name(): String = s"graft-landing($path)"
  override def schema(): StructType = LandingSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    () => new LandingScan(caseInsensitiveOptions)
}

private[sources] class LandingScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = LandingSource.schema
  override def description(): String = s"graft-landing(${LandingSource.pathOf(options)})"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LandingMicroBatchStream(
      LandingSource.pathOf(options),
      options.getInt("maxFilesPerTrigger", 64),
      options.getBoolean("ignoreMissingFiles", false))
}

/** Streaming offset: per-writer (seq, idx) high-water mark into the
  * notification log. JSON is writer-sorted, so equal positions render
  * identically (Offset equality is json equality). */
private[sources] case class LandingOffset(pos: Map[String, (Long, Int)]) extends Offset {
  override def json(): String =
    pos.toSeq.sortBy(_._1).map { case (w, (s, i)) =>
      s""""${w}":[$s,$i]"""
    }.mkString("{", ",", "}")
  def of(writer: String): (Long, Int) = pos.getOrElse(writer, (0L, Int.MaxValue))
}

private[sources] object LandingOffset {
  val Initial: LandingOffset = LandingOffset(Map.empty)
  private val Entry = """"([A-Za-z0-9_.]+)":\[(\d+),(\d+)\]""".r
  def fromJson(json: String): LandingOffset =
    LandingOffset(Entry.findAllMatchIn(json).map { m =>
      m.group(1) -> (m.group(2).toLong, m.group(3).toInt)
    }.toMap)
}

/** One announced object = one partition (gz is non-splittable; the
  * reference is one Lambda per object, README.md:38-40). */
private[sources] case class LandingInputPartition(path: String) extends InputPartition

private[sources] class LandingMicroBatchStream(
    landingDir: String, maxFilesPerTrigger: Int, ignoreMissing: Boolean)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val spark = SparkSession.active
  private val hadoopConf = spark.sessionState.newHadoopConf()
  private val dirPath = new Path(landingDir)
  private def fs: FileSystem = dirPath.getFileSystem(hadoopConf)

  /** Trigger.AvailableNow drain target: freeze the log's current tip;
    * subsequent (maxFiles-capped) batches step up to it and the query
    * stops there, ignoring announcements that arrive mid-drain. */
  @volatile private var availableNowTarget: Option[LandingOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(
      advance(LandingOffset.Initial, unconsumedAfter(LandingOffset.Initial)))

  /** Unconsumed records after `start`, in (seq, idx, writer) order —
    * arrival-ish order that is a per-writer prefix under any cut, so a
    * maxFiles truncation always yields a well-formed offset. Retries
    * once on a mid-list compaction fold (a listed notification file
    * may be deleted before it is read; the merged file covers it). */
  private def unconsumedAfter(start: LandingOffset): Seq[(String, LandingLog.Rec)] = {
    def attempt(): Seq[(String, LandingLog.Rec)] = {
      val fsys = fs
      LandingLog.listNotifications(fsys, dirPath)
        .filter { nf =>
          val (s, i) = start.of(nf.writer)
          // plain file seq s fully consumed only once idx == MaxValue
          // is impossible to know without reading; cheap name-level
          // prune: skip files whose every record must be ≤ (s, i)
          nf.seq > s || (nf.seq == s && i < Int.MaxValue) || nf.merged
        }
        .sortBy(nf => (nf.writer, nf.seq))
        .flatMap(nf => LandingLog.readRecords(fsys, nf).map(nf.writer -> _))
        .filter { case (w, r) =>
          val (s, i) = start.of(w)
          r.seq > s || (r.seq == s && r.idx > i)
        }
        .groupBy { case (w, r) => (w, r.seq, r.idx) }.values.map(_.head).toSeq
        .sortBy { case (w, r) => (r.seq, r.idx, w) }
    }
    try attempt()
    catch { case _: java.io.FileNotFoundException => attempt() }
  }

  private def advance(start: LandingOffset,
                      taken: Seq[(String, LandingLog.Rec)]): LandingOffset = {
    val tops = taken.groupBy(_._1).map { case (w, rs) =>
      val r = rs.map(_._2).maxBy(r => (r.seq, r.idx))
      w -> (r.seq, r.idx)
    }
    // monotonic merge: never regress a writer the batch didn't touch
    LandingOffset(start.pos ++ tops.map { case (w, p) =>
      val prev = start.pos.get(w)
      w -> prev.map(q => if (Ordering[(Long, Int)].gt(q, p)) q else p).getOrElse(p)
    })
  }

  override def initialOffset(): Offset = LandingOffset.Initial
  override def deserializeOffset(json: String): Offset = LandingOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(maxFilesPerTrigger)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LandingOffset]
    val pending0 = unconsumedAfter(s)
    val pending = availableNowTarget match {
      case Some(t) => pending0.filter { case (w, r) =>
        val (ts, ti) = t.pos.getOrElse(w, (0L, -1))
        r.seq < ts || (r.seq == ts && r.idx <= ti)
      }
      case None => pending0
    }
    val capped = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _ => pending
    }
    advance(s, capped)
  }

  override def reportLatestOffset(): Offset =
    advance(LandingOffset.Initial, unconsumedAfter(LandingOffset.Initial))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LandingOffset]
    val e = end.asInstanceOf[LandingOffset]
    unconsumedAfter(s)
      .filter { case (w, r) =>
        val (es, ei) = e.pos.getOrElse(w, (0L, -1))
        r.seq < es || (r.seq == es && r.idx <= ei)
      }
      .map { case (_, r) =>
        val p = new Path(r.path)
        val abs = if (p.isAbsolute) p else new Path(dirPath, r.path)
        LandingInputPartition(abs.toString): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LandingReaderFactory(new SerializableConfiguration(hadoopConf), ignoreMissing)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class LandingReaderFactory(
    conf: SerializableConfiguration, ignoreMissing: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LandingPartitionReader(
      partition.asInstanceOf[LandingInputPartition].path, conf.value, ignoreMissing)
}

/** Reads one landed object: transparent `.gz` (any Hadoop codec by
  * extension), one row per line. */
private[sources] class LandingPartitionReader(
    pathStr: String, conf: Configuration, ignoreMissing: Boolean)
    extends PartitionReader[InternalRow] {

  private val path = new Path(pathStr)
  private val src = UTF8String.fromString(pathStr)
  private var line: String = _

  private val reader: BufferedReader = {
    val fsys = path.getFileSystem(conf)
    val raw =
      try Some(fsys.open(path))
      catch {
        case e: java.io.FileNotFoundException =>
          if (ignoreMissing) None
          else throw new IllegalStateException(
            s"announced landing object is missing: $pathStr — the notification " +
              "log names an object the store no longer has (integrity violation; " +
              "set ignoreMissingFiles=true only for lifecycle-expired backfills)", e)
      }
    raw.map { in =>
      val codec = new CompressionCodecFactory(conf).getCodec(path)
      val stream = if (codec != null) codec.createInputStream(in) else in
      new BufferedReader(new InputStreamReader(stream, StandardCharsets.UTF_8))
    }.orNull
  }

  override def next(): Boolean = {
    if (reader == null) return false
    line = reader.readLine()
    line != null
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(line), src))

  override def close(): Unit = if (reader != null) reader.close()
}
