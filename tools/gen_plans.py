#!/usr/bin/env python3
"""Regenerate PLANS.md mechanically: run `graft.Explain` (formatted physical
plans, sf0.001) over every declared query and tabulate per query:

- exchanges: shuffle `Exchange` nodes (BroadcastExchange and ReusedExchange
  excluded — broadcasts are counted as a feature, reuse is free)
- codegen: distinct whole-stage-codegen units (`[codegen id : N]`)
- features: pushdown (non-empty PushedFilters), broadcast-join,
  sort-merge-join, bnlj, CARTESIAN (audit failure if it ever appears)

Usage: python3 tools/gen_plans.py [explain_output_file]
  With no arg, runs sbt itself (slow); with an arg, parses a captured
  `runMain graft.Explain` output.
"""
import os, re, subprocess, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def get_output(path=None):
    if path:
        return open(path).read()
    return subprocess.run(
        ["sbt", "-batch", "runMain graft.Explain /root/testdata/sf0.001"],
        cwd=ROOT, capture_output=True, text=True).stdout

def main():
    out = get_output(sys.argv[1] if len(sys.argv) > 1 else None)
    out = re.sub(r"^\[info\] ", "", out, flags=re.M)
    sections = re.split(r"^===== (\w+) =====$", out, flags=re.M)[1:]
    rows = {}
    for name, body in zip(sections[::2], sections[1::2]):
        exch = len(re.findall(r"(?<!Reused)(?<!Broadcast)Exchange(?!s)", body)) \
            - body.count("Exchange hashpartitioning") * 0
        # count node lines, not mentions inside detail sections
        exch = len(re.findall(r"^\s*(?::[\s:]*)?[+*]- Exchange ", body, flags=re.M))
        codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", body)))
        feats = []
        if re.search(r"PushedFilters: \[[^\]]", body): feats.append("pushdown")
        if "BroadcastHashJoin" in body: feats.append("broadcast-join")
        if "SortMergeJoin" in body: feats.append("sort-merge-join")
        if "BroadcastNestedLoopJoin" in body: feats.append("bnlj")
        if "CartesianProduct" in body: feats.append("CARTESIAN")
        if "EXPLAIN FAILED" in body: feats.append("FAILED")
        rows[name] = (exch, codegen, ", ".join(feats) if feats else "—")
    lines = [
        "# PLANS — physical-plan audit",
        "",
        "GENERATED FILE — regenerate with `python3 tools/gen_plans.py "
        "[explain_output]` (runs `graft.Explain /root/testdata/sf0.001`).",
        "",
        "Columns: shuffle `Exchange` nodes in the static formatted plan",
        "(BroadcastExchange / ReusedExchange excluded; AQE's runtime",
        "ReuseExchange typically collapses repeated subtrees further),",
        "distinct whole-stage-codegen units, notable features. Audit rules:",
        "no `CartesianProduct` anywhere; `bnlj` only where intended (the",
        "explicit cross join, the single-row total-degree broadcast in the",
        "conductance pipeline); scans show pruned `ReadSchema` and, where",
        "filters exist, `PushedFilters`.",
        "",
        "| query | exchanges | codegen units | features |",
        "|---|---|---|---|",
    ]
    for name in sorted(rows):
        e, c, f = rows[name]
        lines.append(f"| {name} | {e} | {c} | {f} |")
    cart = [n for n, r in rows.items() if "CARTESIAN" in r[2]]
    failed = [n for n, r in rows.items() if "FAILED" in r[2]]
    open(os.path.join(ROOT, "PLANS.md"), "w").write("\n".join(lines) + "\n")
    print(f"PLANS.md: {len(rows)} queries; cartesian={cart or 'none'}; "
          f"failed={failed or 'none'}")
    if cart or failed:
        sys.exit(1)

if __name__ == "__main__":
    main()
