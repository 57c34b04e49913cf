package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.get()
    val fn = SparkEntry.queries(name)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val c = fn(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"[timeq] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
