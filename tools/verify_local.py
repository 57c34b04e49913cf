#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Reads the Verify output dir (spark parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf tables, and compares
row count, sorted-column schema, and a value hash — mirroring the
driver's CORRECTNESS_r{N}.json semantics so mismatches surface locally
before the round gate runs.

Usage: verify_local.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "nan"
        # match on rounded-to-4 values; queries pre-round so this is stable
        return f"{v:.4f}"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = qdir.split("/")[-1]
        try:
            sp = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
            sp_rows, sp_cols = sp.fetchall(), [d[0] for d in sp.description]
        except Exception as e:
            results[name] = {"status": "SPARK_READ_FAIL", "err": str(e)[:200]}
            continue
        if name not in oracle:
            results[name] = {"status": "ROWS_ONLY", "rows": len(sp_rows)}
            continue
        try:
            du = con.execute(oracle[name])
            du_rows, du_cols = du.fetchall(), [d[0] for d in du.description]
        except Exception as e:
            results[name] = {"status": "ORACLE_FAIL", "err": str(e)[:200]}
            continue
        rows_match = len(sp_rows) == len(du_rows)
        schema_match = sorted(sp_cols) == sorted(du_cols)
        hash_match = (rows_match and schema_match and
                      table_hash(sp_rows, sp_cols) == table_hash(du_rows, du_cols))
        status = "GREEN" if hash_match else "MISMATCH"
        results[name] = {"status": status, "rows": len(sp_rows),
                         "oracle_rows": len(du_rows),
                         "rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match}
        if not schema_match:
            results[name]["spark_cols"] = sp_cols
            results[name]["oracle_cols"] = du_cols
    green = sum(1 for r in results.values() if r["status"] == "GREEN")
    rows_only = sum(1 for r in results.values() if r["status"] == "ROWS_ONLY")
    for name, r in sorted(results.items()):
        print(f"{r['status']:>15}  {name}  {json.dumps({k: v for k, v in r.items() if k != 'status'})[:160]}")
    # The driver gate runs its own DuckDB build; a mirror green here and
    # red there is a version-sensitivity bug in the SQL (seen once: the
    # r15 q_emb_mmr recursive-CTE+QUALIFY mirror). Print the version so
    # every local artifact records which DuckDB vouched for it.
    print(f"\n{green} green, {rows_only} rows-only, "
          f"{len(results) - green - rows_only} problems, {len(results)} total "
          f"[duckdb {duckdb.__version__}]")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
