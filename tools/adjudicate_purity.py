#!/usr/bin/env python3
"""sf1 adjudicator for the two purity queries whose registry oracle is
an hour-class recursive CTE (x_knn_purity, x_knn_purity_b6).

The registry oracle's `reach(v, rr)` CTE enumerates EVERY
(vertex, reachable-vertex) pair before taking min(rr) per vertex —
O(sum of component sizes squared) rows, hours of DuckDB CPU at sf1
(TESTDATA.md, round 11). This script computes the IDENTICAL labeling
by the standard fixpoint equivalent: label(v) starts at v and each
round takes the min over neighbors' labels; at the fixpoint
label(v) = min reachable id = the oracle's min(rr). Everything except
the closure runs VERBATIM from the committed oracle SQL — the script
splits the oracle string at the `reach` CTE, materializes the
undirected edge CTE chain (`und`) as written, iterates to fixpoint,
and then runs the verbatim suffix (jl/lc/mj/sz/final SELECT) on the
fixpoint labels. The compare is check_oracle.py's canon (sort columns
by name, rows by stringified values, exact equality).

Usage: python3 tools/adjudicate_purity.py [sf_dir] [verify_out_dir]
  (defaults /tmp/sf1 /tmp/v_purity; verify_out_dir must hold
   oracle_sql.json plus <query>/ parquet dumps from graft.Verify)
"""
import sys, json, glob
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v_purity"
TABLES = ["embeddings"]

REACH_MARK = ",\nreach(v, rr) AS ("
SUFFIX_MARK = ",\njl AS ("

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def adjudicate(name: str, sql: str) -> bool:
    # Uniqueness, not just presence: a future CTE that happens to
    # contain a marker byte-sequence would silently truncate the
    # "verbatim" prefix/suffix and adjudicate the wrong query.
    assert sql.count(REACH_MARK) == 1, f"{name}: reach marker count {sql.count(REACH_MARK)} != 1"
    assert sql.count(SUFFIX_MARK) == 1, f"{name}: suffix marker count {sql.count(SUFFIX_MARK)} != 1"
    prefix = sql.split(REACH_MARK)[0]          # WITH RECURSIVE q .. und
    suffix = sql.split(SUFFIX_MARK)[1]         # lc/mj/sz + final SELECT
    # materialize the verbatim undirected edge chain once
    con.sql(f"CREATE OR REPLACE TEMP TABLE und_t AS {prefix} SELECT a, b FROM und")
    # min-label fixpoint == min reachable id == the oracle's lab CTE
    con.sql("CREATE OR REPLACE TEMP TABLE lab_t AS "
            "SELECT vec_id AS v, vec_id AS component_id FROM embeddings")
    rounds = 0
    while True:
        rounds += 1
        con.sql("""CREATE OR REPLACE TEMP TABLE lab_n AS
                   SELECT l.v,
                          least(l.component_id,
                                coalesce(min(nl.component_id), l.component_id))
                            AS component_id
                   FROM lab_t l
                   LEFT JOIN und_t u ON u.a = l.v
                   LEFT JOIN lab_t nl ON nl.v = u.b
                   GROUP BY l.v, l.component_id""")
        changed = con.sql(
            "SELECT count(*) FROM lab_n n JOIN lab_t o ON n.v = o.v "
            "WHERE n.component_id != o.component_id").fetchone()[0]
        con.sql("CREATE OR REPLACE TEMP TABLE lab_t AS SELECT * FROM lab_n")
        if changed == 0:
            break
        if rounds > 10000:
            raise RuntimeError(f"{name}: no fixpoint after {rounds} rounds")
    # verbatim suffix over the fixpoint labels (lab's column names)
    want = con.sql(
        "WITH lab AS (SELECT v, CAST(component_id AS BIGINT) AS component_id FROM lab_t),\n"
        "jl AS (" + suffix).df()
    got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}")
        return False
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        return False
    neq = (g.astype(str) != w.astype(str))
    if neq.any().any():
        print(f"FAIL {name}: {int(neq.any(axis=1).sum())}/{len(g)} rows differ")
        return False
    print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols, "
          f"fixpoint in {rounds} rounds)")
    return True


oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = [n for n in sorted(oracle) if n.startswith("x_knn_purity")]
assert names, "no purity queries in the dump"
ok = all([adjudicate(n, oracle[n]) for n in names])
sys.exit(0 if ok else 1)
