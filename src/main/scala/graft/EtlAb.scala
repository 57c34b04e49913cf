package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ocsf.OcsfSink

/** Scratch A/B harness for the fan-out cache layout: alternates cache
  * configurations in ONE JVM session so shared-box noise hits every
  * arm equally. Arms:
  *   A  plain cache (shipped shape)
  *   B  sortWithinPartitions(route) + small columnar batches (pruning
  *      via per-batch route stats, no shuffle, full scan parallelism)
  *   C  repartition on (route, salt) (route-pure partitions, one
  *      shuffle, 2 scan tasks per route)
  * Usage: runMain graft.EtlAb [nEvents] [rounds]
  */
object EtlAb {
  def main(args: Array[String]): Unit = {
    val nEvents = if (args.length > 0) args(0).toLong else 1000000L
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.get()
    val filesPerDay = math.max(1, GraftSession.cpus / 13 + 1)
    val landing = Files.createTempDirectory("etl-ab-landing")
    EtlBench.writeCorpus(landing, nEvents, 32)
    val base = graft.sources.FdrSource.load(spark, landing.toString).drop("raw")

    def arm(name: String, mk: () => DataFrame): (String, Double, Double) = {
      val out = Files.createTempDirectory(s"etl-ab-$name")
      val t0 = System.nanoTime()
      val c = mk().cache()
      c.count()
      val tCache = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      OcsfSink.fanOutTimed(c, out.toString, "us-east-1", "123456789012",
        filesPerDay = filesPerDay)
      val tFan = (System.nanoTime() - t1) / 1e9
      c.unpersist(blocking = true)
      (name, tCache, tFan)
    }

    val salt = pmod(xxhash64(coalesce(col("fields").getItem("id"),
      col("fields").getItem("UTCTimestamp"), lit(""))), lit(2))
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "A_plain" -> (() => { bs(spark, 10000); base }),
      "B_sortwp" -> (() => { bs(spark, 2500); base.sortWithinPartitions("route") }),
      "C_repart" -> (() => { bs(spark, 10000)
        base.repartition(26, col("route"), salt) })
    )
    // warm-up: one untimed pass of each arm
    arms.foreach { case (n, mk) => arm(s"warm-$n", mk) }
    val results = (1 to rounds).flatMap { r =>
      arms.map { case (n, mk) => val x = arm(n, mk)
        println(f"[ab] round $r ${x._1}%-10s cache=${x._2}%6.1fs fanout=${x._3}%6.1fs")
        x }
    }
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (n, xs) =>
      val med = xs.map(_._3).sorted.apply(xs.size / 2)
      val medC = xs.map(_._2).sorted.apply(xs.size / 2)
      println(f"[ab] MEDIAN $n%-10s cache=$medC%6.1fs fanout=$med%6.1fs total=${medC + med}%6.1fs")
    }
    spark.stop()
  }

  private def bs(spark: org.apache.spark.sql.SparkSession, n: Int): Unit =
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", n)
}
