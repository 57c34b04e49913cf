package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** DEV-ONLY measurement harness — not part of the library surface
  * (the `graft.*` package placement is only for the sbt `runMain`
  * contract). Reads the corpus dir from the arg, falling back to
  * SPARK_GRAFT_SF_DIR, falling back to the sandbox testdata path.
  *
  * Scratch measurement for the q_graph_pagerank scheduling floor
  * (r15 verdict item 8): counts the Spark JOBS one query execution
  * submits and their wall spans, separating scheduling/serial floor
  * from compute. Box-noise-proof where wall-clock A/Bs are not: the
  * job COUNT is a property of the plan, not the machine.
  *
  * Usage: runMain graft.GraphFloor [sfDir]
  */
object GraphFloor {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    graft.sources.Tables.load(spark, sfDir, "orders").count()
    graft.sources.Tables.load(spark, sfDir, "lineitem").count()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.put(j.jobId, (System.nanoTime(), 0L)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach { case (s, _) =>
          jobs.put(j.jobId, (s, System.nanoTime())) }
        ()
      }
    }
    def run(name: String): Unit = {
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain job-end events
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val spans = jobs.asScala.toSeq.sortBy(_._1)
        .collect { case (id, (s, e)) if e > 0 => (id, (e - s) / 1e9) }
      val sum = spans.map(_._2).sum
      println(f"[floor] $name wall=$wall%.2fs jobs=${spans.size} " +
        f"jobSpanSum=$sum%.2fs gaps=${wall - sum}%.2fs")
      spans.foreach { case (id, s) => println(f"[floor]   job $id%3d $s%6.2fs") }
    }
    Seq("q_graph_pagerank", "q_graph_pagerank", "q_graph_hits").foreach(run)

    // direct-operator A/B: the broadcast rounds (default; 2 broadcast
    // JOBS per round, all serial) vs the shuffle rounds (pipeline into
    // the every-other-round checkpoints; broadcastNodes = 0)
    import org.apache.spark.sql.functions._
    val edges = graft.queries.Relational
      .tradeEdges(spark, sfDir, directed = false)
      .cache()
    edges.count()
    def runDirect(name: String, bn: Long): Unit = {
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.operators.Graph.pageRank(edges, iters = 6, broadcastNodes = bn)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val spans = jobs.asScala.toSeq
        .collect { case (_, (s, e)) if e > 0 => (e - s) / 1e9 }
      println(f"[floor] $name wall=$wall%.2fs jobs=${spans.size} " +
        f"jobSpanSum=${spans.sum}%.2fs")
    }
    (1 to 3).foreach { _ =>
      runDirect("bcast", 200000L)
      runDirect("shuffle", 0L)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      runDirect("bcast_noaqe", 200000L)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // HITS round shape probe: does the 1-row max aggregate's broadcast
    // side RE-RUN the edge join + groupBy, or reuse its exchange? The
    // round body references authRaw twice (max agg + normalize); the
    // scaladoc claims 2 edge joins per iteration, which is only true
    // if the exchange is reused across the two references.
    val hub0 = edges.select(col("src").as("node")).distinct()
      .withColumn("hub", lit(1000000L)).localCheckpoint()
    val authRaw = edges
      .join(broadcast(hub0.withColumnRenamed("node", "src")), "src")
      .groupBy(col("dst")).agg(sum(col("hub")).as("araw"))
    val maxA = authRaw.agg(greatest(max(col("araw")), lit(1L)).as("amax"))
    val auth = authRaw.crossJoin(broadcast(maxA))
      .select(col("dst"), expr("(araw * 1000000L) div amax").as("auth"))
    auth.write.format("noop").mode("overwrite").save()
    val p = auth.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    val reused = p.contains("ReusedExchange") ||
      "ShuffleQueryStage (\\d+)".r.findAllMatchIn(p).map(_.group(1))
        .toSeq.groupBy(identity).exists(_._2.size > 1)
    println(s"[floor] hits-round probe: hash-exchanges=$exchanges reused=$reused")
    println(p.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("QueryStage")).mkString("\n"))
    spark.stop()
  }
}
