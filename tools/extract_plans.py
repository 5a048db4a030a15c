#!/usr/bin/env python3
"""Split a graft.Plans dump into per-query files for a subset of
queries — used to commit plans/r16/<query>_{before,after}.txt evidence
for the optimization round.

Usage: extract_plans.py <plans_dump.txt> <outdir> <suffix> <query> [query ...]
"""
import re
import sys
import pathlib

dump, outdir, suffix = sys.argv[1], pathlib.Path(sys.argv[2]), sys.argv[3]
queries = sys.argv[4:]
txt = open(dump).read()
# "===== Subqueries =====" is a SECTION of the preceding query's
# formatted plan (scalar subqueries), not a query delimiter
plans = dict(re.findall(
    r"===== (?!Subqueries)(\S+) =====\n(.*?)(?=\n===== (?!Subqueries)|\Z)", txt, re.S))
outdir.mkdir(parents=True, exist_ok=True)
for q in queries:
    if q not in plans:
        sys.exit(f"missing plan for {q} in {dump}")
    (outdir / f"{q}_{suffix}.txt").write_text(plans[q] + "\n")
print(f"wrote {len(queries)} {suffix} plans to {outdir}")
