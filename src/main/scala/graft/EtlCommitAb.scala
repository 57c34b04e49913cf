package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ocsf.{IdempotentSink, Normalizers, OcsfSink}

/** DEV-ONLY measurement harness — not part of the library surface;
  * it lives under `graft.*` only so the sbt `runMain` contract can
  * reach it. All inputs are synthetic temp corpora (parameterized by
  * args), all outputs land in temp dirs deleted on completion.
  *
  * Scratch A/B harness for the STREAMING fan-out's commit path: the
  * 4×2M StreamBench rung runs its per-trigger route phase ~2× slower
  * per event than EtlBench's batch fan-out, and the suspects differ in
  * two axes — direct write vs IdempotentSink's two-phase commit, and
  * filesPerDay 1 (streaming auto) vs cores/13+1 (batch latency
  * config). This harness times the four combinations over the SAME
  * cached route-clustered batch in one JVM so box noise hits every arm
  * equally.
  *
  * Usage: runMain graft.EtlCommitAb [nEvents] [rounds]
  */
object EtlCommitAb {
  def main(args: Array[String]): Unit = {
    val nEvents = if (args.length > 0) args(0).toLong else 2000000L
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.get()
    val fpdWide = math.max(1, GraftSession.cpus / 13 + 1)
    val landing = Files.createTempDirectory("commit-ab-landing")
    EtlBench.writeCorpus(landing, nEvents, 64)
    val base = graft.sources.FdrSource.load(spark, landing.toString).drop("raw")
    val clustered = OcsfSink.cacheForFanOut(OcsfSink.routeClustered(base))
    clustered.count()
    val routes = graft.ocsf.OcsfMappings.routes
    var batchSeq = 0L

    // scratch dirs are deleted as soon as an arm is timed — a 4-arm ×
    // N-round run otherwise leaves rounds×arms fan-out trees in /tmp
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      try Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
      catch { case _: Throwable => () }
    }

    def armDirect(fpd: Int): Double = {
      val out = Files.createTempDirectory("commit-ab-direct")
      val t0 = System.nanoTime()
      OcsfSink.fanOutTimed(clustered, out.toString, "us-east-1",
        "123456789012", filesPerDay = fpd)
      val s = (System.nanoTime() - t0) / 1e9
      rmTree(out)
      s
    }

    def armIdem(fpd: Int): Double = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val out = Files.createTempDirectory("commit-ab-idem")
      batchSeq += 1
      val bid = batchSeq
      val t0 = System.nanoTime()
      OcsfSink.withFanOutPool(routes.size, "commit-ab") { implicit ec =>
        val jobs = routes.map { route =>
          Future(IdempotentSink.writeBatch(
            Normalizers.byRoute(route)(clustered.filter(col("route") === route)),
            out.toString, route, "us-east-1", "123456789012", bid,
            filesPerDay = fpd))
        }
        Await.result(Future.sequence(jobs), Duration.Inf)
      }
      val s = (System.nanoTime() - t0) / 1e9
      rmTree(out)
      s
    }

    val arms: Seq[(String, () => Double)] = Seq(
      "direct_fpd1" -> (() => armDirect(1)),
      (s"direct_fpd$fpdWide", () => armDirect(fpdWide)),
      "idem_fpd1" -> (() => armIdem(1)),
      (s"idem_fpd$fpdWide", () => armIdem(fpdWide)))
    arms.foreach { case (n, f) => println(f"[ab] warm $n ${f()}%6.1fs") }
    val res = (1 to rounds).flatMap { r =>
      arms.map { case (n, f) =>
        val s = f(); println(f"[ab] round $r $n%-14s $s%6.1fs"); (n, s)
      }
    }
    res.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (n, xs) =>
      val med = xs.map(_._2).sorted.apply(xs.size / 2)
      println(f"[ab] MEDIAN $n%-14s $med%6.1fs")
    }
    rmTree(landing)
    spark.stop()
  }
}
