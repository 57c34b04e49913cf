package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins (SURVEY.md §4).
  *
  * AQE's skew-join handling splits oversized partitions at runtime,
  * but only for sort-merge joins and only per shuffle; salting is the
  * deterministic, plan-level variant for the pathological case — a
  * handful of hot keys (one noisy host, one viral document) holding
  * orders of magnitude more rows than the rest.
  *
  * Shape: the skewed (big) side gets a random-but-deterministic salt
  * in [0, n); the small side is replicated n ways with every salt
  * value. The join key becomes (key, salt), so one hot key spreads
  * over n reducers. Replication multiplies the small side by n — pick
  * the smallest n that flattens the skew (8–64 in practice).
  */
object SkewJoin {

  /** Deterministic salt derived from the row content (xxhash64 of the
    * whole row's key + a distributing column), avoiding RNG
    * non-determinism across retries. */
  private def salt(cols: Seq[Column], n: Int): Column =
    pmod(xxhash64(cols: _*), lit(n)).cast("int")

  /** Equi-join `big ⋈ small` on `key`, salted `n` ways.
    * `distributor` picks the big-side column(s) that spread a hot
    * key's rows across salts (an id, a timestamp — anything varying
    * within the key group). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 distributor: Seq[String], n: Int = 16): DataFrame = {
    require(n >= 1, "salt fan-out must be >= 1")
    val bigSalted = big.withColumn("__salt",
      salt(col(key) +: distributor.map(col), n))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
