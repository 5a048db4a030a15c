#!/usr/bin/env python3
"""Scale adjudicator for x_cluster_sizes, whose registry oracle is a
recursive reachability CTE (`reach(doc, r)` enumerates every
(doc, reachable-doc) pair before min-reducing) — O(sum of component
sizes squared) intermediate rows, which is fine at sf0.01/sf0.1 but
memory-class-infeasible at sf10 (observed >80 GB on the first
iteration over 500k docs).

Same contract as tools/adjudicate_purity.py: everything EXCEPT the
closure runs VERBATIM from the committed oracle SQL. The script splits
the oracle string at the `reach` CTE, materializes the undirected
`edges` chain exactly as written, computes the identical labeling by
the min-label fixpoint (label(v) starts at doc_id; each round takes
the min over neighbors' labels; at the fixpoint label(v) = min
reachable id = the oracle's min(r)), then runs the verbatim suffix
(sizes histogram + final SELECT) on the fixpoint labels. The compare
is check_oracle.py's canon (sort columns by name, rows by stringified
values, exact equality).

DuckDB memory is capped (GRAFT_DUCKDB_MEM, default 48GB) with a spill
directory so the edge-build joins spill instead of contending for the
whole host.

Usage: python3 tools/adjudicate_cluster_sizes.py [sf_dir] [verify_out_dir]
  (verify_out_dir must hold oracle_sql.json plus x_cluster_sizes/
   parquet from graft.Verify)
"""
import sys, os, json
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/regate_v10"

REACH_MARK = ",\nreach(doc, r) AS ("
SUFFIX_MARK = ",\nsizes AS ("

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
con.sql("SET temp_directory='/tmp/duckdb_spill'")
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def adjudicate(name: str, sql: str) -> bool:
    # Uniqueness, not just presence: a future CTE containing a marker
    # byte-sequence would silently truncate the "verbatim" prefix or
    # suffix and adjudicate the wrong query.
    assert sql.count(REACH_MARK) == 1, f"{name}: reach marker count {sql.count(REACH_MARK)} != 1"
    assert sql.count(SUFFIX_MARK) == 1, f"{name}: suffix marker count {sql.count(SUFFIX_MARK)} != 1"
    prefix = sql.split(REACH_MARK)[0]          # WITH RECURSIVE toks .. edges
    suffix = sql.split(SUFFIX_MARK)[1]         # sizes body + final SELECT
    # the replaced span must be exactly the closure pair (reach + its
    # min-reduce lab) — nothing else may sit between the two markers
    replaced = sql.split(REACH_MARK)[1].split(SUFFIX_MARK)[0]
    assert "lab AS (" in replaced and replaced.count(" AS (") == 1, \
        f"{name}: unexpected CTEs inside the closure span: {replaced[:200]}"
    # materialize the verbatim directed-both-ways edge chain once
    con.sql(f"CREATE OR REPLACE TEMP TABLE edges_t AS {prefix} SELECT a, b FROM edges")
    con.sql("CREATE OR REPLACE TEMP TABLE lab_t AS "
            "SELECT doc_id AS v, doc_id AS lbl FROM documents")
    rounds = 0
    while True:
        rounds += 1
        con.sql("""CREATE OR REPLACE TEMP TABLE lab_n AS
                   SELECT l.v,
                          least(l.lbl, coalesce(min(nl.lbl), l.lbl)) AS lbl
                   FROM lab_t l
                   LEFT JOIN edges_t e ON e.a = l.v
                   LEFT JOIN lab_t nl ON nl.v = e.b
                   GROUP BY l.v, l.lbl""")
        changed = con.sql(
            "SELECT count(*) FROM lab_n n JOIN lab_t o ON n.v = o.v "
            "WHERE n.lbl != o.lbl").fetchone()[0]
        con.sql("CREATE OR REPLACE TEMP TABLE lab_t AS SELECT * FROM lab_n")
        if changed == 0:
            break
        if rounds > 10000:
            raise RuntimeError(f"{name}: no fixpoint after {rounds} rounds")
    # verbatim suffix over the fixpoint labels (lab's column names:
    # the oracle's lab is (doc, cluster_id = CAST(min(r) AS BIGINT)),
    # which at the fixpoint is exactly (v, CAST(lbl AS BIGINT)))
    want = con.sql(
        "WITH lab AS (SELECT v AS doc, CAST(lbl AS BIGINT) AS cluster_id FROM lab_t),\n"
        "sizes AS (" + suffix).df()
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
assert "x_cluster_sizes" in oracle, "x_cluster_sizes not in the dump"
sys.exit(0 if adjudicate("x_cluster_sizes", oracle["x_cluster_sizes"]) else 1)
