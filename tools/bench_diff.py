#!/usr/bin/env python3
"""Diff two full per-query bench artifacts (bench/round*.json) and
attribute regressions using the per-entry contention evidence.

For every query in both artifacts, report entries whose timing moved
beyond the host's documented same-plan swing band (default 3x), and
classify each using the `query_loadavg` sibling map:

  CONTENTION   the slower run's per-entry load is elevated vs that
               run's own median load — the burst is visible inside
               the artifact; re-measure before touching the plan
  UNEXPLAINED  the slower entry's load sits at the run's baseline —
               the 1-minute loadavg lags, so a short burst inside one
               query's window can hide; re-measure in isolation
               (SPARK_GRAFT_ONLY=<name> graft.Bench, or graft.Smoke)
               and only then inspect the plan (EXPLAIN=1)

Sub-second entries are never flagged (swing amplitude there is noise,
not a scale signal).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [ratio]
Exit code = number of UNEXPLAINED findings (CONTENTION doesn't fail).
"""
import json
import statistics
import sys


def load(path):
    d = json.load(open(path))
    return d


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    qo, qn = old["queries"], new["queries"]
    lo, ln = old.get("query_loadavg", {}), new.get("query_loadavg", {})
    common = sorted(set(qo) & set(qn) - {"index_build"})
    if not common:
        sys.exit("no common queries")
    for tag, d, n in (("old", old, len(qo)), ("new", new, len(qn))):
        print(f"{tag}: total={d['value']:.1f}s n={n} "
              f"loadavg_start={d.get('loadavg_start')} valid={d.get('valid')} "
              f"calib_s={d.get('calib_s')} calib_end_s={d.get('calib_end_s')}")
    print(f"common={len(common)} sum_old={sum(qo[k] for k in common):.1f}s "
          f"sum_new={sum(qn[k] for k in common):.1f}s  (flag ratio {ratio}x)")
    # Host-capacity renormalization (round 16): when both artifacts
    # carry the frozen calibration probe, the total comparison is also
    # reported as total/calib ratios — a uniform inflation that tracks
    # the calib line is host capacity, not code (the r13->r15 1.67x
    # adjudication needed out-of-band steal archaeology; this puts it
    # in the diff). Entry-level findings below stay RAW seconds: calib
    # is one number per run, per-entry swings keep their own evidence.
    co, cn = old.get("calib_s", -1.0) or -1.0, new.get("calib_s", -1.0) or -1.0
    if co > 0 and cn > 0:
        ro, rn = old["value"] / co, new["value"] / cn
        print(f"calib-normalized: old total/calib={ro:.1f} new={rn:.1f} "
              f"(host-capacity shift {cn/co:.2f}x; code-attributable shift {rn/ro:.2f}x)")
    elif cn > 0:
        print("calib-normalized: old artifact pre-dates calib_s - raw totals only; "
              "the renormalized series starts at the first calib-carrying round (BASELINE.md)")

    # each run's own baseline load: the median per-entry load — entries
    # materially above it were measured during a busier-than-typical
    # stretch OF THAT RUN
    def baseline(loads):
        vals = [v for v in loads.values() if v >= 0]
        return statistics.median(vals) if vals else -1.0

    bo, bn = baseline(lo), baseline(ln)
    print(f"per-entry load baseline: old={bo:.2f} new={bn:.2f}")
    plan_findings = 0
    for k in common:
        a, b = qo[k], qn[k]
        if a <= 0 or b <= 0:
            continue
        if max(a, b) <= ratio * min(a, b) or max(a, b) < 1.0:
            continue
        slower_new = b > a
        slow_load = (ln if slower_new else lo).get(k, -1.0)
        base = bn if slower_new else bo
        # elevated = 25%+ above that run's own median per-entry load
        # AND at least +0.5 absolute — on a near-idle run (median
        # ~0.05) a pure ratio would label any hair of load
        # "contention" and wave real plan regressions through
        contended = (slow_load >= 0 and base >= 0
                     and slow_load > max(1.25 * base, base + 0.5))
        verdict = "CONTENTION" if contended else "UNEXPLAINED"
        if verdict == "UNEXPLAINED":
            plan_findings += 1
        direction = "slower in new" if slower_new else "slower in old"
        print(f"{verdict:11s} {k:30s} old={a:7.2f}s new={b:7.2f}s "
              f"({direction}; load beside slow entry {slow_load:.2f} vs baseline {base:.2f})")
    if plan_findings == 0:
        print("no unexplained regressions")
    sys.exit(plan_findings)


if __name__ == "__main__":
    main()
