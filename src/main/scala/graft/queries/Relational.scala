package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational analytics surface (SURVEY.md §2 B1–B22).
  *
  * The reference's consumption surface is Athena/Trino SQL over OCSF
  * parquet tables (/root/reference/README.md:48) — i.e. full ANSI
  * filter/project/join/agg/window/subquery analytics. Here each
  * capability is a declarative DataFrame program so Catalyst plans it:
  * filters and projections reach the parquet scan (PushedFilters /
  * ReadSchema), small dimensions broadcast, aggregations get map-side
  * partial combine, and AQE handles skew at scale.
  *
  * Correctness contract: every computed column is aliased identically to
  * the DuckDB oracle SQL (driver sorts columns by name and hashes
  * values), doubles are rounded to 4 decimals on both sides, counts are
  * BIGINT on both sides, dates/timestamps are emitted as strings.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact money sum. The price/discount columns are exactly-2-decimal
    * values, so the decimal(18,2) cast is lossless and the widened
    * decimal sum is EXACT and summation-order-independent; the final
    * double cast is one deterministic IEEE rounding, identical in every
    * engine. A double sum is not: at sf≥1 its order-dependent error
    * passes the 1e-4 hash precision (measured at sf0.1×10 on a ~5e10
    * sum), and at sf100 a ~1e12 double cannot even represent 4 decimal
    * places (ulp 2.4e-4). Used for every money aggregate. */
  private def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact `sum(price * (1 - discount))`: the scale-4 decimal product is
    * exact, so the whole aggregate is — see [[moneySum]]. */
  private def discPriceSum(price: org.apache.spark.sql.Column,
                           disc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(price.cast("decimal(18,2)") *
        (lit(BigDecimal(1)).cast("decimal(18,2)") - disc.cast("decimal(18,2)")))
      .cast("double")

  /** Exact `sum(price * discount)` (TPC-H Q6 revenue shape) — see
    * [[moneySum]]. */
  private def discRevenueSum(price: org.apache.spark.sql.Column,
                             disc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(price.cast("decimal(18,2)") * disc.cast("decimal(18,2)")).cast("double")

  // ---------------------------------------------------------------- B1
  /** Selective scan+filter+project; filter + projection push into the
    * parquet scan (TPC-H Q6 shape). */
  def q6SelectiveFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1997-01-01") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
      .agg(discRevenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
           count(lit(1)).as("n_rows"))

  // ---------------------------------------------------------------- B2
  /** Grouped aggregation with multiple measures (TPC-H Q1 shape); relies
    * on partial (map-side) aggregation before the shuffle.
    *
    * Money sums go through [[moneySum]]/[[discPriceSum]] (exact
    * decimal); the quantity/discount aggregates stay double: quantities
    * are small integers (exactly representable, order-independent) and
    * the avg magnitudes keep error ~1e-12. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
           moneySum(col("l_extendedprice")).as("sum_base_price"),
           discPriceSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
           round(avg("l_quantity"), 4).as("avg_qty"),
           round(avg("l_discount"), 4).as("avg_disc"),
           count(lit(1)).as("count_order"))

  // ---------------------------------------------------------------- B3
  /** Dim ⋈ fact ⋈ fact with group-agg (TPC-H Q3 shape). customer is the
    * small side → broadcast; orders⋈lineitem shuffles on orderkey. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord  = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-07-01"))
    val li   = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-07-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(discPriceSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .select(col("l_orderkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
              col("o_orderpriority").as("orderpriority"),
              col("revenue"))
  }

  /** 6-way star join (TPC-H Q5 shape): region/nation broadcast, fact
    * joins shuffle on their keys, supplier-nation co-location predicate. */
  def q5Multijoin(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(s, dir, "nation")
    val cust   = t(s, dir, "customer")
    val ord    = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val li   = t(s, dir, "lineitem")
    val supp = t(s, dir, "supplier")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
                  col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(discPriceSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
  }

  // ---------------------------------------------------------------- B4
  /** Semi-join (EXISTS): orders having at least one heavy line item. */
  def q4Semijoin(s: SparkSession, dir: String): DataFrame = {
    val heavy = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
    t(s, dir, "orders")
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** IN-subquery (TPC-H Q18 shape): orders whose total quantity across
    * line items exceeds a threshold; aggregation-then-join. */
  def q18InSubquery(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 170)
    t(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
              round(col("o_totalprice"), 4).as("totalprice"))
  }

  // ---------------------------------------------------------------- B5
  /** Anti-join (NOT EXISTS): customers with no fulfilled order. */
  def q16Antijoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))

  // ---------------------------------------------------------------- B6
  /** Left outer join + two-level aggregation (TPC-H Q13 shape):
    * orders-per-customer distribution, keeping zero-order customers. */
  def q13OuterjoinCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))

  // ---------------------------------------------------------------- B7
  /** Scalar subquery: global average as a broadcast single-row join so
    * the plan stays fully distributed (no driver-side collect). */
  def q17AvgSubquery(s: SparkSession, dir: String): DataFrame = {
    val li     = t(s, dir, "lineitem")
    val avgQty = li.agg(avg("l_quantity").as("global_avg_qty"))
    li.join(broadcast(avgQty))
      .filter(col("l_quantity") < col("global_avg_qty") * 0.5)
      .agg(moneySum(col("l_extendedprice")).as("total_price"),
           count(lit(1)).as("n_rows"))
  }

  // ---------------------------------------------------------------- B8
  /** Window rank within partition: top-3 suppliers per nation by
    * account balance. */
  def q7Window(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc, col("s_suppkey"))
    t(s, dir, "supplier")
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("s_suppkey"), col("s_nationkey"), col("rnk"),
              round(col("s_acctbal"), 4).as("acctbal"))
  }

  /** Window lag over an event stream: inter-event delta per user in
    * microseconds (exact integer arithmetic on both engines). */
  def qEventsLag(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .select(col("event_id"), col("user_id"),
              (unix_micros(col("ts")) - col("prev_us")).as("delta_us"))
  }

  // ---------------------------------------------------------------- B9
  /** Distinct and count-distinct over the orders fact. */
  def q8Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           countDistinct(col("o_orderpriority")).as("n_priorities"),
           countDistinct(col("o_orderstatus"), col("o_orderpriority")).as("n_status_prio"))

  // ---------------------------------------------------------------- B10
  /** Top-k: highest-spend customers. Deterministic tiebreak on the key
    * so both engines pick an identical set (TopK = sort+limit; Spark
    * executes it as TakeOrderedAndProject, no full sort at scale). */
  def q9Topk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(moneySum(col("o_totalprice")).as("total_spend"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(10)

  // ---------------------------------------------------------------- B11
  /** HAVING: frequent customers only. */
  def q10Having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
           moneySum(col("o_totalprice")).as("total_spend"))
      .filter(col("n_orders") >= 15)

  // ---------------------------------------------------------------- B12
  /** UNION ALL of two differently-filtered key sets, re-aggregated. */
  def q11Union(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val b = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    a.unionAll(b).groupBy("custkey").agg(count(lit(1)).as("appearances"))
  }

  /** INTERSECT / EXCEPT set operations (distinct semantics). */
  def q12Setops(s: SparkSession, dir: String): DataFrame = {
    val building = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val withOrders = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
    val fulfilled  = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    building.intersect(withOrders).except(fulfilled)
  }

  // ---------------------------------------------------------------- B13
  /** Conditional aggregation (CASE WHEN inside agg). */
  def q14CaseAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      // exact decimal money sum — see q1Agg
      .agg(sum(when(col("o_orderstatus") === "F",
               col("o_totalprice").cast("decimal(18,2)"))
             .otherwise(lit(BigDecimal(0)).cast("decimal(18,2)")))
             .cast("double").as("fulfilled_price"),
           sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open_count"),
           count(lit(1)).as("n_orders"))

  // ---------------------------------------------------------------- B14
  /** ROLLUP grouping sets with subtotals and grand total. */
  def q15Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
           count(lit(1)).as("n_rows"))

  // --------------------------------------------------------------- B14b
  /** CUBE over two dimensions with `grouping_id` — all four grouping
    * sets in one pass with partial aggregation; the gid disambiguates
    * subtotal rows from genuine NULL dimension values. */
  def q24Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("bigint").as("gid"),
           round(sum("l_quantity"), 4).as("sum_qty"),
           count(lit(1)).as("n_rows"))

  // ---------------------------------------------------------------- B8c
  /** Distribution windows: ntile quartiles, percent_rank and cume_dist
    * per priority class, filtered to the top percentile — the "where
    * does this order sit in its cohort" shape. Deterministic: the
    * window orders by (totalprice, orderkey) which is unique, and the
    * rank ratios are rounded before the filter so both engines cut the
    * same boundary. */
  def q25Ntile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("quartile", ntile(4).over(w))
      // round4, not round(x,4): rank ratios (rank-1)/(n-1) are exactly
      // the ratio-of-small-ints class whose .xxxx5 ties Spark and
      // DuckDB round to opposite sides (see TextFunctions.round4)
      .withColumn("pct_rank",
        graft.functions.TextFunctions.round4(percent_rank().over(w)))
      .withColumn("cum_dist",
        graft.functions.TextFunctions.round4(cume_dist().over(w)))
      .filter(col("quartile") === 1 && col("pct_rank") <= 0.01)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice"), 4).as("totalprice"),
        col("quartile"), col("pct_rank"), col("cum_dist"))
  }

  // ---------------------------------------------------------------- B15
  /** Complex predicates: OR-of-ANDs with BETWEEN / IN / LIKE (TPC-H Q19
    * shape). Catalyst pushes the common conjuncts into both scans. */
  def q19ComplexPred(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p  = t(s, dir, "part")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_name").like("%widget%") && col("p_type").isin("PROMO", "ECONOMY") &&
          col("l_quantity") >= 25))
      .agg(discPriceSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  // ---------------------------------------------------------------- B16
  /** JSON extraction from a string payload column. `from_json` with a
    * typed schema parses each payload exactly once into a prunable
    * struct (vs `get_json_object`, which re-parses the string per
    * extracted path — the reference's payload maps carry dozens of
    * keys, so per-path parsing multiplies the scan cost at 100 TB). */
  def qEventsJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
      .groupBy("event_type")
      .agg(round(avg("k"), 4).as("avg_k"),
           sum("k").as("sum_k"),
           count(lit(1)).as("n_events"))

  // ---------------------------------------------------------------- B17
  /** Time bucketing (date_trunc to hour) over the event stream. */
  def qEventsTimebucket(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("bucket"))
      .agg(count(lit(1)).as("n_events"),
           round(sum("value"), 4).as("total_value"))

  // ---------------------------------------------------------------- B28
  /** Time-series densification (gap fill): each event type's hourly
    * grid is generated with `sequence()` from its own min/max hour and
    * left-joined back to the observed hourly aggregates, so silent
    * gaps become explicit zero rows — the shape every
    * alerting/rate-monitoring consumer needs (a missing hour must read
    * as 0 events, not as an absent row). Scale: the grid side is
    * exploded from a per-type 1-row aggregate (types × hours rows,
    * bounded by calendar time, not data volume), so AQE broadcasts it
    * against the hourly aggregate; the only data-sized work is the
    * same partial-agg'd groupBy B17 runs. */
  def qEventsGapfill(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket_ts"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("total_value"))
    val grid = ev
      .groupBy("event_type")
      .agg(date_trunc("hour", min("ts")).as("h0"),
           date_trunc("hour", max("ts")).as("h1"))
      .select(col("event_type"),
              explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
                .as("bucket_ts"))
    grid.join(hourly, Seq("event_type", "bucket_ts"), "left")
      .select(col("event_type"),
              date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
              coalesce(col("n_events"), lit(0L)).as("n_events"),
              coalesce(col("total_value"), lit(0.0)).as("total_value"))
  }

  // ---------------------------------------------------------------- B31
  /** Markov transition matrix over per-user event sequences — the
    * process-chain / behavior-baseline shape security analytics runs
    * on event streams: which event type follows which, with the
    * conditional transition probability. One lag window partitioned by
    * `user_id` (high cardinality, ordered by (ts, event_id) so ties
    * can't flip the sequence between engines), then a 25-row matrix
    * aggregate; the per-source share window runs over that tiny
    * relation only. `round4` (scaled rounding) because p is a ratio of
    * small ints — the .xxxx5-tie class where `round(x, 4)` and
    * DuckDB's rounding land on opposite sides. */
  // ---------------------------------------------------------------- B32
  /** Top event-path trigrams — the multi-step extension of the B31
    * transition matrix: the 20 most frequent 3-event sequences across
    * all per-user timelines (process-chain / attack-path mining). One
    * window shuffle on the high-cardinality `user_id` (two `lead`s
    * share the single sort), then a partial-agg'd count over ≤|types|³
    * keys into a TakeOrderedAndProject; the full (n_paths, steps)
    * ordering makes the top-20 cut tie-proof across engines. */
  def qEventsPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq_ = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("step2", lead("event_type", 1).over(seq_))
      .withColumn("step3", lead("event_type", 2).over(seq_))
      .filter(col("step2").isNotNull && col("step3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  def qEventsTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq_ = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val matrix = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("type_from", lag("event_type", 1).over(seq_))
      .filter(col("type_from").isNotNull)
      .groupBy(col("type_from"), col("event_type").as("type_to"))
      .agg(count(lit(1)).as("n_transitions"))
    val perFrom = Window.partitionBy("type_from")
    matrix.withColumn("p",
      graft.functions.TextFunctions.round4(
        col("n_transitions").cast("double") /
          sum("n_transitions").over(perFrom)))
  }

  // ---------------------------------------------------------------- B30
  /** Window FRAME aggregates — trailing 7-row moving average and a
    * running total per user over daily activity (the rates/trends
    * shape B8's rank/lag family doesn't cover). Scale: partitioned by
    * `user_id` (high cardinality — parallel at any size); sums of ≤7
    * small ints are exact in double, so the avg is
    * accumulation-order-proof across engines. */
  def qEventsMoving(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val trail = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    val cum = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.select(col("user_id"),
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      col("n_events"),
      round(avg("n_events").over(trail), 4).as("avg7"),
      sum("n_events").over(cum).as("cum_events"))
  }

  // ---------------------------------------------------------------- B29
  /** Event-rate anomaly detection over the DENSIFIED hourly series —
    * the security-ops composition B28 exists for: a silent hour is a
    * zero row, so an outage scores as a large negative z instead of
    * vanishing from the stats. Per-type mean/stddev come from one
    * partial-agg'd groupBy and broadcast back onto the grid (never a
    * per-type window over the corpus); flagged rows are |z| ≥ 2 with
    * z rounded 4 (the repo's hashable float precision). */
  def qEventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket_ts"))
      .agg(count(lit(1)).as("n_events"))
    val grid = ev
      .groupBy("event_type")
      .agg(date_trunc("hour", min("ts")).as("h0"),
           date_trunc("hour", max("ts")).as("h1"))
      .select(col("event_type"),
              explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
                .as("bucket_ts"))
    val filled = grid.join(hourly, Seq("event_type", "bucket_ts"), "left")
      .select(col("event_type"), col("bucket_ts"),
              coalesce(col("n_events"), lit(0L)).as("n_events"))
    val stats = filled.groupBy("event_type")
      .agg(avg("n_events").as("mu"), stddev_samp("n_events").as("sigma"))
    filled.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", round((col("n_events") - col("mu")) / col("sigma"), 4))
      .filter(abs(col("z")) >= 2.0)
      .select(col("event_type"),
              date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
              col("n_events"), col("z"))
  }

  // ---------------------------------------------------------------- B4c
  /** Correlated EXISTS subquery through the SQL front-end: Catalyst
    * decorrelates it into the same LeftSemi join the DataFrame API
    * would plan (PlanSpec pins that), proving the SQL surface users
    * would migrate from Athena keeps its plans. */
  def q26ExistsCorrelated(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("g_customer")
    t(s, dir, "orders").createOrReplaceTempView("g_orders")
    s.sql(
      """SELECT c_custkey, c_name, round(c_acctbal, 4) AS acctbal
        |FROM g_customer
        |WHERE EXISTS (SELECT 1 FROM g_orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT'
        |                AND o_totalprice > 150000)""".stripMargin)
  }

  // ---------------------------------------------------------------- B26
  /** Cohort retention matrix: users bucketed by first-seen day, then
    * distinct active users per (cohort, day) — the engagement shape
    * behind every retention dashboard. The first-seen relation is one
    * min-aggregate re-joined on the user id; both aggregations combine
    * map-side. */
  def qEventsRetention(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    e.join(cohorts, "user_id")
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
               date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  // ---------------------------------------------------------------- B27
  /** Ordered funnel: users who viewed, then clicked AFTER the first
    * view, then purchased AFTER that click — the staged-conversion
    * shape behind product funnels. Three aggregates, each joining the
    * previous stage's (user, first-ts) relation on the user id; every
    * stage partially aggregates map-side and the stage relations only
    * shrink. */
  def qEventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    def first(df: DataFrame, typ: String): DataFrame =
      df.filter(col("event_type") === typ)
        .groupBy("user_id").agg(min(col("ts")).as(s"${typ}_ts"))
    val views = first(e, "view")
    val clicks = e.join(views, "user_id")
      .filter(col("event_type") === "click" && col("ts") > col("view_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("click_ts"))
    val purchases = e.join(clicks, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("click_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("purchase_ts"))
    views.agg(count(lit(1)).as("n_view")).crossJoin(
        clicks.agg(count(lit(1)).as("n_click"))).crossJoin(
        purchases.agg(count(lit(1)).as("n_purchase")))
  }

  // ---------------------------------------------------------------- B18
  /** Sessionization: a gap of >30 min starts a new session — the
    * classic gap-and-island pattern via the [[graft.operators.Sessionize]]
    * operator. */
  def qEventsSessions(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize
      .withSessionIds(t(s, dir, "events"), "user_id", "ts", "event_id", 1800L)
      .groupBy("user_id")
      .agg(max("session_seq").as("n_sessions"),
           count(lit(1)).as("n_events"))

  // ---------------------------------------------------------------- B19
  /** Pivot-style conditional matrix: per-user counts by event type. */
  def qEventsPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
           sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
           sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
           sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("signups"),
           sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))

  // ---------------------------------------------------------------- B20
  /** String functions: substr/upper/length/LIKE. */
  def q20Strings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(upper(substring(col("p_name"), 1, 1)).as("first_letter"))
      .agg(count(lit(1)).as("n_parts"),
           round(avg(length(col("p_name"))), 4).as("avg_name_len"),
           sum(when(col("p_name").like("%e%"), 1L).otherwise(0L)).as("with_e"))

  // ---------------------------------------------------------------- B21
  /** OCSF-style classification of an event stream: broadcast-join the
    * event-type→class mapping dimension (the reference's
    * mapped_qfdr_events_to_class.json pattern,
    * qopcfdr_stream_loader.py:150-214) rather than a CASE chain. */
  def qOcsfClassify(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mapping = Seq(
      ("signup",   3002, "Authentication"),
      ("click",    4002, "HTTP Activity"),
      ("view",     4002, "HTTP Activity"),
      ("purchase", 6002, "Application Lifecycle"),
      ("error",    2004, "Detection Finding")
    ).toDF("evt", "class_uid", "class_name")
    t(s, dir, "events")
      .join(broadcast(mapping), col("event_type") === col("evt"), "left_outer")
      .withColumn("class_uid", coalesce(col("class_uid"), lit(0)))
      .withColumn("class_name", coalesce(col("class_name"), lit("Unknown")))
      .groupBy("class_uid", "class_name")
      .agg(count(lit(1)).as("n_events"),
           round(sum("value"), 4).as("total_value"))
  }

  // ---------------------------------------------------------------- B22
  /** Raw HLL++ estimates — the sketch values themselves, engine-
    * specific by nature (AccuracySpec pins their error; the GATE query
    * below turns the same bound into a hash-checkable verdict). */
  def approxDistinctRaw(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
           approx_count_distinct(col("event_id")).as("approx_events"))

  /** B22 GATE (bounded-match, graduated r19 from rows-only): the HLL
    * estimate can't hash-match another engine's sketch family, but its
    * ACCURACY CONTRACT can — emit the exact counts plus an integer-
    * arithmetic verdict `|approx − exact|·100 ≤ exact·15` (3σ of the
    * default rsd 0.05, the AccuracySpec bound). The DuckDB oracle
    * computes the same exact counts and literal TRUE verdicts, so a
    * sketch drifting out of bound turns the gate red instead of
    * hiding behind `no_oracle`. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(count_distinct(col("user_id")).as("exact_users"),
           count_distinct(col("event_id")).as("exact_events"),
           approx_count_distinct(col("user_id")).as("au"),
           approx_count_distinct(col("event_id")).as("ae"))
      .select(col("exact_users"), col("exact_events"),
        (abs(col("au") - col("exact_users")) * lit(100L) <=
          col("exact_users") * lit(15L)).as("users_within_bound"),
        (abs(col("ae") - col("exact_events")) * lit(100L) <=
          col("exact_events") * lit(15L)).as("events_within_bound"))

  // ---------------------------------------------------------------- B22b
  /** Mergeable-sketch distinct rollup, raw form: one HLL sketch per
    * day, then a sketch UNION for the total — the incremental pattern
    * a lake uses at 100 TB (daily sketches persist; totals, trailing
    * windows and re-aggregations come from unioning kilobyte sketches,
    * never rescanning the raw events). AccuracySpec pins the union's
    * error against the exact distinct count. */
  def approxDistinctRollupRaw(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily.agg(
      count(lit(1)).as("n_days"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users_total"))
  }

  /** B22b GATE (bounded-match, graduated r19): the sketch-union
    * estimate checked against the exact total at the AccuracySpec 10%
    * bound, in integer arithmetic; day count exact. Same stance as
    * [[qApproxDistinct]] — the verdict hashes, the sketch stays
    * engine-private. */
  def qApproxDistinctRollup(s: SparkSession, dir: String): DataFrame = {
    val sk = approxDistinctRollupRaw(s, dir)
    val ex = t(s, dir, "events")
      .agg(count_distinct(col("user_id")).as("exact_users_total"))
    sk.crossJoin(ex).select(col("n_days"), col("exact_users_total"),
      (abs(col("approx_users_total") - col("exact_users_total")) * lit(100L) <=
        col("exact_users_total") * lit(10L)).as("rollup_within_bound"))
  }

  // ---------------------------------------------------------------- B23
  /** Exact interpolated percentiles, kept exact so the DuckDB oracle
    * can hash-verify them. NOT the scale path: Spark's exact
    * `percentile` aggregation state is a value→count map — O(distinct
    * values) per group, which on a continuous column like
    * `l_extendedprice` approaches the group's row count and OOMs an
    * executor at 100×. At scale use [[qApproxPercentile]]: KLL-sketch
    * state of bounded size, mergeable map-side. */
  def qPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(percentile(col("l_quantity"), lit(0.25)), 4).as("p25"),
        round(percentile(col("l_quantity"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_quantity"), lit(0.75)), 4).as("p75"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("price_p90"))

  /** B23b raw form — the scale path for percentiles:
    * `approx_percentile` carries a bounded-size sketch per group
    * regardless of value cardinality (accuracy 10000 ≈ 0.01% rank
    * error), the same exact-for-the-oracle / approx-for-scale split
    * B22 uses for count-distinct. AccuracySpec pins the error against
    * the exact percentiles. */
  def approxPercentileRaw(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("ap50"),
        approx_percentile(col("l_extendedprice"), lit(0.9), lit(10000)).as("price_ap90"),
        count(lit(1)).as("n_rows"))

  /** B23b GATE (bounded-match, graduated r19; rank-gate form r20): a
    * KLL/GK sketch value can't hash-match across engines, but its RANK
    * contract can — the approx p-quantile's exact rank must lie within
    * p ± 0.01 (accuracy 10000 guarantees rank error ≤ 1e-4; the ±0.01
    * window is 100× slack, flake-free at every SF). r20 (r19 verdict
    * item 9): the gate is checked in RANK space — count the rows
    * strictly below / at-or-below the sketch value and cross-multiply
    * against the window (`lt·100 ≤ n·(p+1)·100` form, pure integers) —
    * instead of four exact `percentile` aggregates whose value-map
    * state is O(distinct values) per group and OOMs on a continuous
    * column at 100 TB. Tie runs spanning the window pass exactly as
    * before (lt counts the run's start, le its end). The oracle emits
    * the same group keys, exact row counts and literal TRUE verdicts. */
  def qApproxPercentile(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val sk = li.groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("ap50"),
        approx_percentile(col("l_extendedprice"), lit(0.9), lit(10000)).as("ap90"))
    li.join(broadcast(sk), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") < col("ap50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_quantity") <= col("ap50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_extendedprice") < col("ap90"), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("l_extendedprice") <= col("ap90"), 1L).otherwise(0L)).as("le90"))
      .select(col("l_returnflag"), col("n_rows"),
        (col("lt50") * 100L <= col("n_rows") * 51L &&
          col("le50") * 100L >= col("n_rows") * 49L)
          .as("p50_within_rank_bound"),
        (col("lt90") * 100L <= col("n_rows") * 91L &&
          col("le90") * 100L >= col("n_rows") * 89L)
          .as("p90_within_rank_bound"))
  }

  // ---------------------------------------------------------------- B24
  /** As-of join: each purchase event paired with the user's most
    * recent click at-or-before it — via [[graft.operators.AsOfJoin]] (one
    * shuffle, union+window; no inequality-join blow-up). */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val proc = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val logins = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    graft.operators.AsOfJoin.asOf(proc, logins, "user_id", "ts",
        Seq("ts" -> "login_ts"))
      .select(col("event_id"),
        unix_micros(col("login_ts")).as("login_epoch_us"),
        (col("ts").cast("long") - col("login_ts").cast("long")).as("gap_sec"))
  }

  // ---------------------------------------------------------------- B25
  /** Range join: customers whose balance falls inside a supplier's
    * ±50 band — via [[graft.operators.RangeJoin]] (bucketized
    * equi-join, no nested-loop blow-up). */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val points = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val ranges = t(s, dir, "supplier")
      .select(col("s_nationkey"),
              (col("s_acctbal") - 50).as("lo"), (col("s_acctbal") + 50).as("hi"))
    graft.operators.RangeJoin
      .pointInRange(points, "c_acctbal", ranges, "lo", "hi", bucketWidth = 100.0)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_matches"),
           countDistinct("c_custkey").as("n_customers"))
  }

  // ---------------------------------------------------------------- C34
  /** Z-order digest: Morton z-values over (l_partkey, l_suppkey),
    * aggregated per high-bit bucket — exercises the full quantize +
    * bit-interleave pipeline bit-for-bit against the DuckDB oracle
    * (the identical formula, emitted by [[graft.operators.Zorder
    * .quantizeSql]]/[[graft.operators.Zorder.zValueSql]]). The layout
    * write itself — range shuffle on z, narrow per-file min-max stats
    * on every layout column — is pinned by ZorderSpec. */
  def qLiZorder(s: SparkSession, dir: String): DataFrame =
    graft.operators.Zorder.withZValue(
        t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey")),
        Seq("l_partkey", "l_suppkey"), "zval", 16)
      .groupBy(shiftright(col("zval"), 22).as("zbucket"))
      .agg(count(lit(1)).as("n"),
           min("zval").as("min_z"), max("zval").as("max_z"))

  // ---------------------------------------------------------------- C71
  /** Integer-exact PageRank over the undirected customer↔supplier
    * trade graph (distinct (o_custkey, l_suppkey) pairs, both
    * directions) — see [[graft.operators.Graph.pageRank]]. Suppliers
    * serving many well-connected customers outrank long-tail ones:
    * the link-centrality quality prior web curation pipelines consume.
    * Hash-green oracled: every step is bigint arithmetic, so DuckDB
    * reproduces the ranks bit-for-bit from a generated
    * iteration-unrolled mirror ([[pagerankOracleSql]]). */
  /** The customer↔supplier trade graph both centrality queries (and
    * their mirrors' edge CTEs) are built on: distinct (o_custkey,
    * l_suppkey) pairs labeled `c<id>`/`s<id>`. `directed = false`
    * unions both directions (the C71 undirected stance); `true` keeps
    * cust→supp only (the C93 two-role stance). ONE definition so the
    * three consumers cannot drift. */
  private[graft] def tradeEdges(s: SparkSession, dir: String,
                                directed: Boolean): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    // LONG node keys (r19, guide §2.3 narrower types): customers map to
    // even longs (2k), suppliers to odd (2k+1) — a bijection with the
    // public "c<k>"/"s<k>" names, decoded once on the final node-sized
    // relation ([[nodeName]]). Every Pregel round's edge join, groupBy
    // and distinct then shuffles 8-byte longs instead of rendered
    // strings (measured: the pair encodes/compares dominated the
    // fixed-iteration loops), and the distinct here runs on the raw
    // integer pair before any rendering. Graph arithmetic is
    // key-representation-independent, so ranks are bit-identical.
    val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("cust"),
              (col("l_suppkey").cast("long") * 2 + 1).as("supp"))
      .distinct()
    val fwd = cs.select(col("cust").as("src"), col("supp").as("dst"))
    if (directed) fwd
    else fwd.union(cs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  /** Decode a [[tradeEdges]] long node key back to the public name:
    * even → "c<k>", odd → "s<k>" (k = key div 2). */
  private def nodeName(c: Column): Column =
    concat(when(c % 2 === 0, lit("c")).otherwise(lit("s")),
      shiftright(c, 1).cast("string"))

  def qGraphPagerank(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Graph
    Graph.pageRank(tradeEdges(s, dir, directed = false), iters = 6)
      .select(nodeName(col("node")).as("node"), col("rank").as("pr"))
  }

  /** DuckDB mirror of [[qGraphPagerank]]: the fixed-iteration loop
    * unrolled into chained CTEs, every constant interpolated from the
    * SAME [[graft.operators.Graph]] constants the operator uses —
    * damping rational, init rank and floor divisions cannot drift
    * between the engines. */
  private def pagerankOracleSql: String = {
    import graft.operators.Graph
    val iters = 6
    val init = Graph.PrInitRank
    val num = Graph.PrDampNum
    val den = Graph.PrDampDen
    val base = init * (den - num) / den
    val its = (1 to iters).map { i =>
      val prev = s"it${i - 1}"
      s"""it$i AS MATERIALIZED (
        |  SELECT n.node,
        |         CAST($base + (($num * (COALESCE(c.contrib, 0) + d.dshare))
        |                       // $den) AS BIGINT) AS pr
        |  FROM nodes n
        |  LEFT JOIN (SELECT ee.dst AS node,
        |                    SUM(r.pr // deg.outdeg) AS contrib
        |             FROM ee
        |             JOIN $prev r ON ee.src = r.node
        |             JOIN deg ON deg.src = ee.src
        |             GROUP BY 1) c ON c.node = n.node
        |  CROSS JOIN (SELECT COALESCE((SELECT SUM(r.pr) FROM $prev r
        |                               WHERE r.node NOT IN (SELECT src FROM deg)),
        |                              0)
        |              // (SELECT nn FROM ncnt) AS dshare) d)""".stripMargin
    }.mkString(",\n")
    // AS MATERIALIZED: DuckDB inlines multiply-referenced CTEs, and
    // each iteration reads its predecessor twice (contrib + dangling)
    // — inlined, the chain re-evaluates 2^iters times
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT
      |             'c' || CAST(o_custkey AS VARCHAR) AS cust,
      |             's' || CAST(l_suppkey AS VARCHAR) AS supp
      |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |ee AS MATERIALIZED (SELECT cust AS src, supp AS dst FROM e
      |       UNION SELECT supp AS src, cust AS dst FROM e),
      |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM ee),
      |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM ee GROUP BY 1),
      |ncnt AS (SELECT count(*) AS nn FROM nodes),
      |it0 AS MATERIALIZED (SELECT node, CAST($init AS BIGINT) AS pr FROM nodes),
      |$its
      |SELECT node, pr FROM it$iters""".stripMargin
  }

  // ---------------------------------------------------------------- C93
  /** Integer-exact HITS over the DIRECTED customer→supplier trade
    * graph (distinct (o_custkey, l_suppkey) pairs): customers are
    * HUBS (they only point), suppliers AUTHORITIES (they are only
    * pointed at) — the two-role centrality a crawl frontier wants
    * beside [[qGraphPagerank]]'s single axis. See
    * [[graft.operators.Graph.hits]]; every step is bigint arithmetic
    * with max-scaling floor division, so DuckDB reproduces the scores
    * bit-for-bit from the iteration-unrolled mirror
    * ([[hitsOracleSql]]). */
  def qGraphHits(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Graph
    Graph.hits(tradeEdges(s, dir, directed = true), iters = 3)
      .select(nodeName(col("node")).as("node"), col("auth"), col("hub"))
  }

  /** DuckDB mirror of [[qGraphHits]]: the fixed-iteration loop
    * unrolled into chained CTEs — auth_i from hub_{i-1}, hub_i from
    * auth_i, each max-normalized by a scalar-subquery floor division —
    * with the scale constant interpolated from the SAME
    * [[graft.operators.Graph.HitsScale]] the operator uses. */
  private def hitsOracleSql: String = {
    import graft.operators.Graph
    val iters = 3
    val sc = Graph.HitsScale
    val its = (1 to iters).map { i =>
      val prevHub = s"hub${i - 1}"
      s"""araw$i AS MATERIALIZED (
        |  SELECT e.dst AS node, CAST(SUM(h.hub) AS BIGINT) AS araw
        |  FROM e JOIN $prevHub h ON e.src = h.node GROUP BY 1),
        |auth$i AS MATERIALIZED (
        |  SELECT node,
        |         CAST((araw * $sc) // GREATEST((SELECT MAX(araw) FROM araw$i), 1)
        |              AS BIGINT) AS auth
        |  FROM araw$i),
        |hraw$i AS MATERIALIZED (
        |  SELECT e.src AS node, CAST(SUM(a.auth) AS BIGINT) AS hraw
        |  FROM e JOIN auth$i a ON e.dst = a.node GROUP BY 1),
        |hub$i AS MATERIALIZED (
        |  SELECT node,
        |         CAST((hraw * $sc) // GREATEST((SELECT MAX(hraw) FROM hraw$i), 1)
        |              AS BIGINT) AS hub
        |  FROM hraw$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT
      |             'c' || CAST(o_custkey AS VARCHAR) AS src,
      |             's' || CAST(l_suppkey AS VARCHAR) AS dst
      |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |nodes AS MATERIALIZED (SELECT src AS node FROM e
      |         UNION SELECT dst AS node FROM e),
      |hub0 AS MATERIALIZED (SELECT node, CAST($sc AS BIGINT) AS hub FROM nodes),
      |$its
      |SELECT n.node, COALESCE(a.auth, 0) AS auth, COALESCE(h.hub, 0) AS hub
      |FROM nodes n
      |LEFT JOIN auth$iters a ON a.node = n.node
      |LEFT JOIN hub$iters h ON h.node = n.node""".stripMargin
  }

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank"    -> (qGraphPagerank _),
    "q_graph_hits"        -> (qGraphHits _),
    "q_li_zorder"         -> (qLiZorder _),
    "q23_range"           -> (qRangeJoin _),
    "q22_asof"            -> (qAsofJoin _),
    "q21_percentile"      -> (qPercentile _),
    "q_approx_percentile" -> (qApproxPercentile _),
    "q6_selective_filter" -> (q6SelectiveFilter _),
    "q1_agg"              -> (q1Agg _),
    "q3_join_agg"         -> (q3JoinAgg _),
    "q5_multijoin"        -> (q5Multijoin _),
    "q4_semijoin"         -> (q4Semijoin _),
    "q18_in_subquery"     -> (q18InSubquery _),
    "q16_antijoin"        -> (q16Antijoin _),
    "q13_outerjoin_count" -> (q13OuterjoinCount _),
    "q17_avg_subquery"    -> (q17AvgSubquery _),
    "q7_window"           -> (q7Window _),
    "q_events_lag"        -> (qEventsLag _),
    "q8_distinct"         -> (q8Distinct _),
    "q9_topk"             -> (q9Topk _),
    "q10_having"          -> (q10Having _),
    "q11_union"           -> (q11Union _),
    "q12_setops"          -> (q12Setops _),
    "q14_case_agg"        -> (q14CaseAgg _),
    "q15_rollup"          -> (q15Rollup _),
    "q24_cube"            -> (q24Cube _),
    "q25_ntile"           -> (q25Ntile _),
    "q26_exists_correlated" -> (q26ExistsCorrelated _),
    "q_events_retention"  -> (qEventsRetention _),
    "q_events_funnel"     -> (qEventsFunnel _),
    "q19_complex_pred"    -> (q19ComplexPred _),
    "q_events_json"       -> (qEventsJson _),
    "q_events_timebucket" -> (qEventsTimebucket _),
    "q_events_gapfill"    -> (qEventsGapfill _),
    "q_events_anomaly"    -> (qEventsAnomaly _),
    "q_events_moving"     -> (qEventsMoving _),
    "q_events_transitions" -> (qEventsTransitions _),
    "q_events_paths"      -> (qEventsPaths _),
    "q_events_sessions"   -> (qEventsSessions _),
    "q_events_pivot"      -> (qEventsPivot _),
    "q20_strings"         -> (q20Strings _),
    "q_ocsf_classify"     -> (qOcsfClassify _),
    "q_approx_distinct"   -> (qApproxDistinct _),
    "q_approx_distinct_rollup" -> (qApproxDistinctRollup _)
  )

  val oracleSql: Map[String, String] = Map(
    "q_graph_pagerank" -> pagerankOracleSql,
    "q_graph_hits" -> hitsOracleSql,
    "q_li_zorder" -> {
      val q0 = graft.operators.Zorder.quantizeSql("l_partkey", "lo0", "hi0", 16)
      val q1 = graft.operators.Zorder.quantizeSql("l_suppkey", "lo1", "hi1", 16)
      val z = graft.operators.Zorder.zValueSql(Seq("q0", "q1"), 16)
      s"""WITH b AS (SELECT min(l_partkey) AS lo0, max(l_partkey) AS hi0,
         |                  min(l_suppkey) AS lo1, max(l_suppkey) AS hi1
         |           FROM lineitem),
         |q AS (SELECT $q0 AS q0, $q1 AS q1 FROM lineitem, b),
         |z AS (SELECT $z AS zval FROM q)
         |SELECT zval >> 22 AS zbucket, CAST(count(*) AS BIGINT) AS n,
         |       min(zval) AS min_z, max(zval) AS max_z
         |FROM z GROUP BY zbucket""".stripMargin
    },
    "q23_range" ->
      """SELECT s.s_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_matches,
        |  CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
        |FROM customer c
        |JOIN supplier s
        |  ON c.c_acctbal BETWEEN s.s_acctbal - 50 AND s.s_acctbal + 50
        |GROUP BY s.s_nationkey""".stripMargin,
    "q22_asof" ->
      """SELECT p.event_id,
        |  epoch_us(l.ts) AS login_epoch_us,
        |  CAST(date_diff('second', l.ts, p.ts) AS BIGINT) AS gap_sec
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events
        |                WHERE event_type = 'click') l
        |  ON p.user_id = l.user_id AND p.ts >= l.ts""".stripMargin,
    "q21_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin,
    "q6_selective_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |       o_orderpriority AS orderpriority,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate  > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q4_semijoin" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin,
    "q18_in_subquery" ->
      """SELECT c_name, o_orderkey, round(o_totalprice, 4) AS totalprice
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 170)""".stripMargin,
    "q16_antijoin" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_mktsegment""".stripMargin,
    "q13_outerjoin_count" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q17_avg_subquery" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_quantity < (SELECT avg(l_quantity) FROM lineitem) * 0.5""".stripMargin,
    "q7_window" ->
      """SELECT s_suppkey, s_nationkey, rnk, round(s_acctbal, 4) AS acctbal
        |FROM (SELECT s_suppkey, s_nationkey, s_acctbal,
        |             CAST(rank() OVER (PARTITION BY s_nationkey
        |                               ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS rnk
        |      FROM supplier)
        |WHERE rnk <= 3""".stripMargin,
    "q_events_lag" ->
      """SELECT event_id, user_id,
        |       epoch_us(ts) - lag(epoch_us(ts)) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
        |FROM events""".stripMargin,
    "q8_distinct" ->
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
        |       CAST(count(DISTINCT (o_orderstatus, o_orderpriority)) AS BIGINT) AS n_status_prio
        |FROM orders""".stripMargin,
    "q9_topk" ->
      """SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY total_spend DESC, o_custkey
        |LIMIT 10""".stripMargin,
    "q10_having" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 15""".stripMargin,
    "q11_union" ->
      """SELECT custkey, CAST(count(*) AS BIGINT) AS appearances
        |FROM (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |      UNION ALL
        |      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY custkey""".stripMargin,
    "q12_setops" ->
      """(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT
        | SELECT o_custkey AS custkey FROM orders)
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q14_case_agg" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F'
        |                     THEN CAST(o_totalprice AS DECIMAL(18,2))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS fulfilled_price,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_count,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority""".stripMargin,
    "q15_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q24_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q26_exists_correlated" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 4) AS acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT'
        |                AND o_totalprice > 150000)""".stripMargin,
    "q_events_funnel" ->
      """WITH views AS (SELECT user_id, min(ts) AS view_ts FROM events
        |               WHERE event_type = 'view' GROUP BY user_id),
        |clicks AS (SELECT e.user_id, min(e.ts) AS click_ts
        |           FROM events e JOIN views USING (user_id)
        |           WHERE e.event_type = 'click' AND e.ts > view_ts
        |           GROUP BY e.user_id),
        |purchases AS (SELECT e.user_id, min(e.ts) AS purchase_ts
        |              FROM events e JOIN clicks USING (user_id)
        |              WHERE e.event_type = 'purchase' AND e.ts > click_ts
        |              GROUP BY e.user_id)
        |SELECT CAST((SELECT count(*) FROM views) AS BIGINT) AS n_view,
        |       CAST((SELECT count(*) FROM clicks) AS BIGINT) AS n_click,
        |       CAST((SELECT count(*) FROM purchases) AS BIGINT) AS n_purchase""".stripMargin,
    "q_events_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohorts AS (SELECT user_id, min(day) AS cohort_day
        |            FROM e GROUP BY user_id)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |       strftime(day, '%Y-%m-%d') AS day,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        |FROM e JOIN cohorts USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q25_ntile" ->
      """WITH w AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         round(o_totalprice, 4) AS totalprice,
        |         CAST(ntile(4) OVER win AS INT) AS quartile,
        |         round(percent_rank() OVER win, 4) AS pct_rank,
        |         round(cume_dist() OVER win, 4) AS cum_dist
        |  FROM orders
        |  WINDOW win AS (PARTITION BY o_orderpriority
        |                 ORDER BY o_totalprice DESC, o_orderkey))
        |SELECT o_orderkey, o_orderpriority, totalprice,
        |       quartile, pct_rank, cum_dist
        |FROM w WHERE quartile = 1 AND pct_rank <= 0.01""".stripMargin,
    "q19_complex_pred" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_name LIKE '%widget%' AND p_type IN ('PROMO', 'ECONOMY') AND l_quantity >= 25)""".stripMargin,
    "q_events_json" ->
      """SELECT event_type,
        |       round(avg(k), 4) AS avg_k,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,
    "q_events_timebucket" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value), 4) AS total_value
        |FROM events
        |GROUP BY 1""".stripMargin,
    "q_events_gapfill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         round(sum(value), 4) AS total_value
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |         unnest(generate_series(date_trunc('hour', min(ts)),
        |                                date_trunc('hour', max(ts)),
        |                                INTERVAL 1 HOUR)) AS bucket_ts
        |  FROM events GROUP BY event_type)
        |SELECT g.event_type,
        |       strftime(g.bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket,
        |       COALESCE(h.n_events, 0) AS n_events,
        |       COALESCE(h.total_value, 0.0) AS total_value
        |FROM grid g LEFT JOIN hourly h USING (event_type, bucket_ts)""".stripMargin,
    "q_events_moving" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_events,
        |       round(avg(n_events) OVER (PARTITION BY user_id ORDER BY day
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg7,
        |       CAST(sum(n_events) OVER (PARTITION BY user_id ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_events
        |FROM daily""".stripMargin,
    "q_events_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS type_from
        |  FROM events),
        |matrix AS (
        |  SELECT type_from, event_type AS type_to,
        |         CAST(count(*) AS BIGINT) AS n_transitions
        |  FROM seq WHERE type_from IS NOT NULL GROUP BY 1, 2)
        |SELECT type_from, type_to, n_transitions,
        |       round(n_transitions * 10000.0 /
        |             sum(n_transitions) OVER (PARTITION BY type_from))
        |         / 10000.0 AS p
        |FROM matrix""".stripMargin,
    "q_events_paths" ->
      """WITH seq AS (
        |  SELECT event_type AS step1,
        |         lead(event_type, 1) OVER w AS step2,
        |         lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
        |FROM seq
        |WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1, step2, step3
        |LIMIT 20""".stripMargin,
    "q_events_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |         unnest(generate_series(date_trunc('hour', min(ts)),
        |                                date_trunc('hour', max(ts)),
        |                                INTERVAL 1 HOUR)) AS bucket_ts
        |  FROM events GROUP BY event_type),
        |filled AS (
        |  SELECT g.event_type, g.bucket_ts,
        |         COALESCE(h.n_events, 0) AS n_events
        |  FROM grid g LEFT JOIN hourly h USING (event_type, bucket_ts)),
        |stats AS (
        |  SELECT event_type, avg(n_events) AS mu,
        |         stddev_samp(n_events) AS sigma
        |  FROM filled GROUP BY event_type)
        |SELECT f.event_type,
        |       strftime(f.bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket,
        |       f.n_events, round((f.n_events - s.mu) / s.sigma, 4) AS z
        |FROM filled f JOIN stats s USING (event_type)
        |WHERE abs(round((f.n_events - s.mu) / s.sigma, 4)) >= 2.0""".stripMargin,
    "q_events_sessions" ->
      """WITH g AS (
        |  SELECT user_id,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id,
        |       CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "q_events_pivot" ->
      """SELECT user_id,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
        |FROM events
        |GROUP BY user_id""".stripMargin,
    "q20_strings" ->
      """SELECT upper(substr(p_name, 1, 1)) AS first_letter,
        |       CAST(count(*) AS BIGINT) AS n_parts,
        |       round(avg(length(p_name)), 4) AS avg_name_len,
        |       CAST(sum(CASE WHEN p_name LIKE '%e%' THEN 1 ELSE 0 END) AS BIGINT) AS with_e
        |FROM part
        |GROUP BY 1""".stripMargin,
    "q_ocsf_classify" ->
      """SELECT CASE event_type WHEN 'signup' THEN 3002
        |                       WHEN 'click' THEN 4002
        |                       WHEN 'view' THEN 4002
        |                       WHEN 'purchase' THEN 6002
        |                       WHEN 'error' THEN 2004
        |                       ELSE 0 END AS class_uid,
        |       CASE event_type WHEN 'signup' THEN 'Authentication'
        |                       WHEN 'click' THEN 'HTTP Activity'
        |                       WHEN 'view' THEN 'HTTP Activity'
        |                       WHEN 'purchase' THEN 'Application Lifecycle'
        |                       WHEN 'error' THEN 'Detection Finding'
        |                       ELSE 'Unknown' END AS class_name,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value), 4) AS total_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    // B22/B22b/B23b gates (r19): the sketch VALUES stay engine-private
    // but their accuracy contracts hash — the oracle computes the
    // exact side and literal TRUE verdicts (see the GATE scaladocs).
    "q_approx_distinct" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       CAST(count(DISTINCT event_id) AS BIGINT) AS exact_events,
        |       TRUE AS users_within_bound, TRUE AS events_within_bound
        |FROM events""".stripMargin,
    "q_approx_distinct_rollup" ->
      """SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users_total,
        |       TRUE AS rollup_within_bound
        |FROM events""".stripMargin,
    "q_approx_percentile" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |       TRUE AS p50_within_rank_bound, TRUE AS p90_within_rank_bound
        |FROM lineitem GROUP BY 1""".stripMargin
  )
}
