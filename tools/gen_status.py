#!/usr/bin/env python3
"""Regenerate STATUS.md mechanically from the working tree, so the
implementation line numbers can never go stale: query list and order come
from SparkEntry.queries, implementation sites from grepping the `def` in
src/main/scala, check mode from Oracles.scala key presence.

Usage: python3 tools/gen_status.py          # rewrites STATUS.md in place
"""
import os, re, sys, subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src/main/scala")

def declared_queries():
    """Names in SparkEntry.queries, in declaration order."""
    text = open(os.path.join(SRC, "graft/SparkEntry.scala")).read()
    body = text.split("def queries", 1)[1]
    return re.findall(r'"(\w+)"\s*->', body.split("def oracleSql")[0])

def oracle_names():
    text = open(os.path.join(SRC, "graft/Oracles.scala")).read()
    return set(re.findall(r'"(\w+)"\s*->', text))

def def_sites():
    """query name -> file:line of its `def`."""
    sites = {}
    for dirpath, _, files in os.walk(SRC):
        for fn in files:
            if not fn.endswith(".scala"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ROOT)
            for i, line in enumerate(open(path), 1):
                m = re.match(r"\s*def (q_\w+|bigclam_\w+)\b", line)
                if m:
                    sites[m.group(1)] = f"{rel}:{i}"
    return sites

def main():
    queries = declared_queries()
    oracles = oracle_names()
    sites = def_sites()
    n_oracle = sum(1 for q in queries if q in oracles)
    out = [
        f"# STATUS — operator coverage map",
        "",
        f"All {len(queries)} declared queries in `SparkEntry.queries`, their",
        "implementation sites, and verification mode. `oracle` = hash-checked",
        f"against DuckDB by the driver ({n_oracle} of {len(queries)});",
        "`invariant` = no SQL-expressible oracle, covered by scalatest",
        "invariants instead.",
        "",
        "GENERATED FILE — regenerate with `python3 tools/gen_status.py`",
        "(line numbers are read from the working tree, never hand-edited).",
        "",
        "| # | query | implementation | check |",
        "|---|---|---|---|",
    ]
    missing = []
    for i, q in enumerate(queries, 1):
        site = sites.get(q)
        if site is None:
            missing.append(q)
            site = "NOT FOUND"
        check = "oracle" if q in oracles else "invariant"
        out.append(f"| {i} | `{q}` | `{site}` | {check} |")
    open(os.path.join(ROOT, "STATUS.md"), "w").write("\n".join(out) + "\n")
    print(f"STATUS.md: {len(queries)} queries, {n_oracle} oracle-backed, "
          f"{len(queries) - n_oracle} invariant")
    if missing:
        print(f"WARNING: no def site found for: {missing}", file=sys.stderr)
        sys.exit(1)

if __name__ == "__main__":
    main()
