#!/usr/bin/env python3
"""DuckDB semantics probe (r16 verdict item 7).

The sandbox cannot install the driver's (newer) DuckDB, so the repo
vendors the gate-relevant SEMANTICS instead: this script asserts the
handful of constructs the generated oracle mirrors rely on, with the
values observed on DuckDB 1.0.0 (the version tools/verify_local.py
runs). Run it under ANY other DuckDB version and every construct whose
behavior moved FAILS LOUD by name — so a driver-side version bump
surfaces as a named semantic break instead of an opaque hash mismatch.

Usage: python3 tools/duckdb_semantics_probe.py   (exit 0 = all pinned
semantics hold; exit 1 = prints the divergent construct names)
"""
import sys

import duckdb


def main():
    con = duckdb.connect()
    failures = []

    def check(name, got, want):
        if got != want:
            failures.append(f"{name}: expected {want!r}, got {got!r}")

    def q(sql):
        return con.execute(sql).fetchall()

    # least/greatest NULL handling: 1.0.0 IGNORES NULL arguments
    # (greatest(NULL, 1) = 1). Releases that propagate NULL break any
    # mirror folding an optional value through greatest/coalesce —
    # the r17 mmr mirror replaced its use with CASE, but pin it so a
    # future mirror that reaches for greatest gets a named failure.
    check("greatest_least_null_ignored",
          q("SELECT greatest(NULL, 1), greatest(1, NULL), least(NULL, 1)"),
          [(1, 1, 1)])

    # round() halfway behavior: away from zero on DECIMAL literals,
    # and the round4 scaled-rounding identity the float mirrors use.
    check("round_half_away",
          q("SELECT round(0.5), round(1.5), round(2.5), round(-0.5)"),
          [(1, 2, 3, -1)])
    check("round_scale4",
          q("SELECT round(0.12345::DOUBLE, 4), round(0.12335::DOUBLE, 4)"),
          [(0.1235, 0.1234)])

    # list_aggregate(..., 'sum') over BIGINT widens to HUGEINT — the
    # reason every mirror that EMITS such a sum must CAST it to BIGINT
    # (the q_emb_mmr r15/r16 gate red). If a release changes the
    # return type, the casts stay correct but pin it anyway: the
    # mirrors' overflow analyses assume 128-bit accumulation.
    check("list_aggregate_sum_hugeint",
          q("SELECT typeof(list_aggregate([1::BIGINT], 'sum'))"),
          [("HUGEINT",)])
    check("sum_bigint_hugeint",
          q("SELECT typeof(sum(x)) FROM (SELECT 1::BIGINT AS x) t GROUP BY ALL"),
          [("HUGEINT",)])

    # HUGEINT -> pandas conversion lands as float64 on 1.0.0: an
    # emitted uncast sum hashes as '3.0' where Spark's parquet BIGINT
    # hashes as '3'. This is the construct that kept q_emb_mmr red at
    # the driver gate while green locally.
    df = con.execute(
        "SELECT list_aggregate([1::BIGINT, 2::BIGINT], 'sum') AS h").df()
    check("hugeint_pandas_dtype", list(df.dtypes.astype(str)), ["float64"])

    # default NULL ordering: NULLS LAST in both directions on 1.0.0.
    # Mirrors that ORDER BY a nullable key without an explicit NULLS
    # clause depend on this.
    check("null_order_desc_last",
          q("SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x DESC"),
          [(2,), (1,), (None,)])
    check("null_order_asc_last",
          q("SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x"),
          [(1,), (2,), (None,)])

    # window default frame with ORDER BY is RANGE (peers included):
    # both k=1 rows see the full 30. An engine defaulting to ROWS
    # would return 10, 30, 60.
    check("window_default_frame_range_peers",
          q("SELECT sum(v) OVER (ORDER BY k) FROM "
            "(VALUES (1,10),(1,20),(2,30)) t(k,v) ORDER BY k, 1"),
          [(30,), (30,), (60,)])

    # ORDER BY + LIMIT inside a CTE is preserved through the outer
    # query (the pool-cut construct every retrieve-rerank mirror uses).
    check("cte_order_limit",
          q("WITH c AS (SELECT x FROM (VALUES (3),(1),(2)) t(x) "
            "ORDER BY x DESC LIMIT 2) SELECT min(x), max(x) FROM c"),
          [(2, 3)])

    # MATERIALIZED CTEs parse and evaluate (the mmr mirror's guard
    # against exponential re-inlining of the stage chain).
    check("materialized_cte",
          q("WITH t AS MATERIALIZED (SELECT 1 AS x) "
            "SELECT a.x + b.x FROM t a, t b"),
          [(2,)])

    # integer '/' is float division ('//' is integer) — mirrors use
    # '//' or CAST for integer quotients.
    check("slash_is_float_division",
          q("SELECT 7/2, 7//2"),
          [(3.5, 3)])

    # 1-based list indexing + generate_series(1, 0) is empty — the
    # quantized dot-product template depends on both.
    check("list_index_one_based",
          q("SELECT ([10, 20, 30])[1]"),
          [(10,)])
    check("generate_series_empty",
          q("SELECT len(generate_series(1, 0))"),
          [(0,)])

    # string_split('') yields [''] (not []) — the token mirrors
    # COALESCE text to '' and rely on this shape.
    check("string_split_empty",
          q("SELECT string_split('', ' ')"),
          [([""],)])

    # md5 is the portable tiebreak hash; pin one value.
    check("md5_stability",
          q("SELECT md5('1')"),
          [("c4ca4238a0b923820dcc509a6f75849b",)])

    # r18 additions — the constructs the PCA / unigram-trainer /
    # nprobe-advice mirrors introduced:

    # integer '//' TRUNCATES TOWARD ZERO on negatives (C-style), which
    # differs from floor division. Spark `div` truncates too, so the
    # two agree on POSITIVE operands only — mirrors must never divide
    # a possibly-negative value (the PCA mirror multiplies instead).
    check("int_div_negative_truncates",
          q("SELECT -7//2, 7//2"),
          [(-3, 3)])

    # HUGEINT × BIGINT stays HUGEINT and CASTs to VARCHAR as plain
    # digits (sign included, no separators/exponent) — the q_emb_pca
    # wq = praw·qinv decimal-as-TEXT construct that sidesteps the
    # HUGEINT→pandas-float64 widening pinned above.
    check("hugeint_times_bigint_type",
          q("SELECT typeof(CAST(5 AS HUGEINT) * 3::BIGINT)"),
          [("HUGEINT",)])
    check("hugeint_varchar_plain_digits",
          q("SELECT CAST(CAST(-123456789012345678 AS HUGEINT)"
            " * 100000 AS VARCHAR)"),
          [("-12345678901234567800000",)])

    # CTE column aliases over VALUES rows carrying LIST literals — the
    # comps(comp, qc, qinv, cconst) relation the PCA mirror interpolates.
    check("cte_values_list_literals",
          q("WITH c(a, b) AS (VALUES (1, [10, 20]), (2, [30, 40])) "
            "SELECT a, b[2] FROM c ORDER BY a"),
          [(1, 20), (2, 40)])

    # the unigram-trainer quantize hop: round(-ln(u/tot)·1e6)::BIGINT
    # must agree with the JVM on the 1e6 grid (ln is IEEE-double in
    # both engines; a last-ulp disagreement only matters within ~1e-9
    # of a rounding boundary — pin one exact interior value).
    check("quantized_ln_cost",
          q("SELECT CAST(round(-ln(CAST(1 AS DOUBLE) / 2)"
            " * 1000000.0, 0) AS BIGINT)"),
          [(693147,)])

    version = duckdb.__version__
    if failures:
        print(f"DIVERGENT SEMANTICS under duckdb {version} "
              f"(pinned on 1.0.0):")
        for f in failures:
            print(f"  FAIL {f}")
        sys.exit(1)
    print(f"all {21} pinned semantics hold under duckdb {version}")


if __name__ == "__main__":
    main()
