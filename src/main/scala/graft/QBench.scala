package graft

/** DEV-ONLY measurement harness — not part of the library surface
  * (the `graft.*` package placement is only for the sbt `runMain`
  * contract).
  *
  * Single-query micro-bench: times the named SparkEntry queries on
  * SPARK_GRAFT_SF_DIR (cold + median-of-3 steady after one warm-up),
  * for iterating on one operator without paying the full Bench run.
  *
  * Usage: runMain graft.QBench q_graph_pagerank [q_other ...]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QBench <queryName> [more ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val steady = Seq.fill(3)(once()).sorted.apply(1)
      println(f"[qbench] $name cold=$cold%.3f steady=$steady%.3f")
    }
    spark.stop()
  }
}
