package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C34 — Z-order layout: the z-value must be the exact Morton
  * interleave, and the laid-out files must carry narrow min-max stats
  * on EVERY layout column (that is the property parquet skipping prunes
  * on), where a lexicographic sort narrows only its leading column. */
class ZorderSpec extends SparkSpec {

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue is the exact bit interleave of its quantized inputs") {
    val df = spark.range(1000).select(
      pmod(col("id") * 2654435761L, lit(65536L)).as("qa"),
      pmod(col("id") * 40503L + 7, lit(65536L)).as("qb"))
    val rows = df.withColumn("z", Zorder.zValue(Seq(col("qa"), col("qb")), 16))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1), 16),
        s"qa=${r.getLong(0)} qb=${r.getLong(1)}")
    }
  }

  test("quantize is the identity on [0, 2^bits) inputs and clamps the top") {
    val df = spark.range(0, 65536, 97).select(col("id").as("x"))
    val got = df.select(col("x"),
        Zorder.quantize(col("x"), lit(0L), lit(65535L), 16).as("q"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == math.min(r.getLong(0), 65535L)))
  }

  /** Per-file (min, max) width of `c`, for each written file. */
  private def fileWidths(df: DataFrame, c: String): Seq[(Double, Double)] =
    df.groupBy(input_file_name())
      .agg(min(col(c).cast("double")).as("lo"), max(col(c).cast("double")).as("hi"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq

  test("z-ordered files carry narrow min-max stats on BOTH columns; a lexicographic sort only on the first") {
    // 64x64 grid: both dims span [0, 63]
    val df = spark.range(4096).select(
      (col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    val zdir = Files.createTempDirectory("zorder").toString + "/z"
    val ldir = Files.createTempDirectory("zorder").toString + "/lex"
    Zorder.write(df, Seq("a", "b"), numFiles = 16, zdir)
    df.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .write.mode("overwrite").parquet(ldir)

    val z = spark.read.parquet(zdir)
    val lex = spark.read.parquet(ldir)
    // ideal z block = 16x16 (width 15); range-sampling slop allowed up
    // to half the global width on BOTH dims
    val za = fileWidths(z, "a"); val zb = fileWidths(z, "b")
    assert(za.size > 1 && zb.size > 1)
    assert(za.forall { case (lo, hi) => hi - lo <= 31 },
      s"z-layout a-widths too wide: $za")
    assert(zb.forall { case (lo, hi) => hi - lo <= 31 },
      s"z-layout b-widths too wide: $zb")
    // the lexicographic layout leaves the second column unclustered:
    // nearly every file spans ~the full b range
    val lb = fileWidths(lex, "b")
    assert(lb.count { case (lo, hi) => hi - lo >= 55 } >= lb.size - 2,
      s"expected lex files to span ~full b range: $lb")

    // file-skipping, the actual point: a range predicate on the SECOND
    // column intersects few z-files but ~all lex files
    def hit(ws: Seq[(Double, Double)], lo: Double, hi: Double): Int =
      ws.count { case (l, h) => h >= lo && l <= hi }
    assert(hit(zb, 10, 15) <= zb.size / 2,
      s"z-layout should skip most files for b in [10,15]: $zb")
    assert(hit(lb, 10, 15) >= lb.size - 2,
      s"lex layout cannot skip on b: $lb")
  }

  test("quantizeSql/zValueSql mirror the Column implementation exactly") {
    // cross-check the SQL strings through Spark's own SQL engine on the
    // same data (the DuckDB side is covered by the q_li_zorder oracle)
    val df = spark.range(500).select(
      (col("id") * 37 % 1000).as("x"), (col("id") * 91 % 777).as("y"))
    df.createOrReplaceTempView("zt")
    val qx = Zorder.quantizeSql("x", "(SELECT min(x) FROM zt)", "(SELECT max(x) FROM zt)", 8)
    val qy = Zorder.quantizeSql("y", "(SELECT min(y) FROM zt)", "(SELECT max(y) FROM zt)", 8)
    val sqlZ = spark.sql(
        s"SELECT x, y, ${Zorder.zValueSql(Seq(qx, qy), 8)} AS z FROM zt")
      .orderBy("x", "y").collect().map(_.getLong(2)).toSeq
    val colZ = Zorder.withZValue(df, Seq("x", "y"), "z", 8)
      .orderBy("x", "y").collect().map(r => r.getLong(r.fieldIndex("z"))).toSeq
    assert(sqlZ == colZ)
  }
}
