package graft

import java.io.{File, PrintWriter}

/** DEV-ONLY: dump the formatted physical plan of many SparkEntry
  * queries in one JVM (Profile does one query per sbt runMain, paying
  * a Spark session per plan). Writes <outDir>/<query>.txt.
  * Usage: runMain graft.PlanDump <outDir> <query> [more ...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <query> [more ...]")
    val outDir = new File(args(0))
    outDir.mkdirs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val w = new PrintWriter(new File(outDir, s"$name.txt"))
      try w.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
      println(s"[plandump] $name -> ${outDir.getPath}/$name.txt")
    }
    spark.stop()
  }
}
