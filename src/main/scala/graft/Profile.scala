package graft

import java.io.{File, PrintWriter}

/** Plan inspector: writes the formatted physical plan and timing for
  * one SparkEntry query to /tmp/profile_<query>.txt.
  * Usage: runMain graft.Profile <query> [sfDir] */
object Profile {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val out = new PrintWriter(new File(s"/tmp/profile_$name.txt"))
    out.println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val first = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val second = (System.nanoTime() - t1) / 1e9
    def s3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    out.println(s"first run: ${s3(first)} s, second run: ${s3(second)} s")
    out.close()
    println(s"[profile] $name first=${s3(first)} s second=${s3(second)} s -> /tmp/profile_$name.txt")
    spark.stop()
  }
}
