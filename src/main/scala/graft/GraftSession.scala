package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Settings chosen for correctness at local[N] and sanity at cluster
  * scale: AQE on (runtime coalescing + skew-join splitting), broadcast
  * threshold large enough that every dimension table in the star schema
  * broadcasts, shuffle partitions sized to the core budget (on a real
  * cluster this is overridden by AQE coalescing anyway).
  *
  * Parallelism defaults to the driver's SPARK_GRAFT_CPUS env var so the
  * harness, Bench and Verify all agree on the core budget.
  */
object GraftSession {

  /** Core budget: driver-pinned via SPARK_GRAFT_CPUS, else 32. */
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(master: String = s"local[$cpus]",
              shufflePartitions: Int = cpus): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // set once at build time (not per-read): parquet TIMESTAMP(NANOS)
      // columns (events.ts in the driver testdata) are read as Long;
      // Tables.load converts back gated on the parquet logical type
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) (events.ts in
      // newer driver testdata) must read as TIMESTAMP, not NTZ: the
      // session tz is UTC so values are identical, and the epoch fns
      // (unix_micros etc.) only accept TIMESTAMP
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
