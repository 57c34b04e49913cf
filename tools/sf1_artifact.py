#!/usr/bin/env python3
"""Regenerate CORRECTNESS_SF1.json from a Verify dump at the sf1-scale
directory — one command, so the committed artifact can never lag the
query surface for lack of tooling (it has, twice).

Usage:
  python3 tools/make_sfbig.py /root/testdata/sf0.1 /tmp/sfbig 10
  sbt "runMain graft.Verify /tmp/sfbig /tmp/vout_sf1"
  python3 tools/sf1_artifact.py /tmp/sfbig /tmp/vout_sf1

Writes CORRECTNESS_SF1.json (driver format: rows/schema/hash match per
query) and prints the summary line.
"""
import sys, json, glob, hashlib, os
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


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout_sf1"
    artifact = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_SF1.json"
    con = duckdb.connect()
    con.sql("SET timezone='UTC'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    res = {}
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        sp = con.execute(f"SELECT * FROM read_parquet('{d}*.parquet')")
        sp_rows, sp_cols = sp.fetchall(), [c[0] for c in sp.description]
        if name not in oracle:
            res[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": len(sp_rows),
                         "oracle_rows": None, "err": None}
            continue
        try:
            du = con.execute(oracle[name])
            du_rows, du_cols = du.fetchall(), [c[0] for c in du.description]
        except Exception as e:
            res[name] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "spark_rows": len(sp_rows),
                         "oracle_rows": None, "err": str(e)[:200]}
            continue
        rm = len(sp_rows) == len(du_rows)
        sm = sorted(sp_cols) == sorted(du_cols)
        hm = rm and sm and table_hash(sp_rows, sp_cols) == table_hash(du_rows, du_cols)
        res[name] = {"rows_match": rm, "schema_match": sm, "hash_match": hm,
                     "spark_rows": len(sp_rows), "oracle_rows": len(du_rows),
                     "err": None}
    json.dump(dict(sorted(res.items())), open(artifact, "w"),
              indent=1, sort_keys=True)
    greens = sum(1 for v in res.values() if v["hash_match"])
    rows_only = sum(1 for v in res.values() if v["hash_match"] is None)
    probs = [k for k, v in res.items() if v["hash_match"] is False or v["err"]]
    print(f"{len(res)} entries, {greens} hash-green, {rows_only} rows-only, "
          f"problems: {probs}")


if __name__ == "__main__":
    main()
