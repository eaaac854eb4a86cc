#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify into OUTDIR/<name>/, run the corresponding oracle SQL from
OUTDIR/oracle_sql.json in DuckDB over the same sf tables, and compare
rows / schema (column names) / values (columns sorted by name).

Faithfulness to the driver (round-2 lesson): the driver pandas-sorts every
dumped parquet — INCLUDING no-oracle ones — and crashes on any ARRAY /
STRUCT / MAP cell ("unhashable type: numpy.ndarray"). So this gate
hard-fails any output whose schema contains a nested type, for every
query directory present in OUTDIR, oracle or not.

Usage: check.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def nested_cols(rel):
    """Column names whose duckdb type is a LIST/ARRAY/STRUCT/MAP/UNION —
    the types the driver's pandas comparator cannot sort."""
    bad = []
    for name, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if "[]" in ts or ts.startswith(("STRUCT", "MAP", "UNION", "LIST")):
            bad.append(f"{name}:{ts}")
    return bad

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # every dumped query dir is checked; oracle-less ones get the
    # nested-type + rows>0 screen the driver effectively applies
    dumped = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d)))
    results = {}
    for name in dumped:
        if only and name not in only: continue
        qdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            results[name] = {"ok": False, "err": "no spark output"}
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            bad = nested_cols(spark_rel)
            if bad:
                results[name] = {"ok": False,
                    "err": f"nested output columns (driver comparator crashes on these): {bad}"}
                continue
            spark_cols = list(spark_rel.columns)
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"}
            continue
        if name not in oracle:
            ok = len(spark_rows) > 0
            results[name] = {"ok": ok, "no_oracle": True,
                             "rows_spark": len(spark_rows)}
            if not ok:
                results[name]["err"] = "no-oracle query returned 0 rows"
            continue
        try:
            duck_rel = con.sql(oracle[name])
            duck_cols = list(duck_rel.columns)
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"}
            continue
        r = {"rows_spark": len(spark_rows), "rows_duck": len(duck_rows)}
        r["rows_match"] = len(spark_rows) == len(duck_rows)
        r["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
        if r["schema_match"]:
            s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
            d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
            s_vals = [tuple(norm(row[i]) for i in s_idx) for row in spark_rows]
            d_vals = [tuple(norm(row[i]) for i in d_idx) for row in duck_rows]
            r["hash_match"] = s_vals == d_vals
            if not r["hash_match"]:
                for j, (a, b) in enumerate(zip(s_vals, d_vals)):
                    if a != b:
                        r["first_diff"] = {"row": j, "spark": a, "duck": b,
                                           "cols": sorted(spark_cols)}
                        break
                else:
                    r["first_diff"] = "row count prefix equal; extra rows"
        else:
            r["hash_match"] = False
            r["first_diff"] = {"spark_cols": spark_cols, "duck_cols": duck_cols}
        r["ok"] = r["rows_match"] and r["schema_match"] and r["hash_match"]
        results[name] = r
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    n_noora = sum(1 for r in results.values() if r.get("no_oracle"))
    print(f"== {n_ok}/{len(results)} queries pass ({n_noora} no-oracle rows-only) ==")
    for name, r in sorted(results.items()):
        if r.get("ok"):
            tag = "OK*" if r.get("no_oracle") else "OK "
            print(f"  {tag}  {name} ({r['rows_spark']} rows)")
    for name, r in sorted(results.items()):
        if not r.get("ok"):
            print(f"  FAIL {name}: " + json.dumps(r, default=str)[:600])

if __name__ == "__main__":
    main()
