#!/usr/bin/env python3
"""Partitioned DuckDB oracle for x_minhash_lsh_pairs at scales where
the one-shot CTE chain is measured-infeasible on a single node (round
14: the sf10 candidate x shingle verification join spilled >55 GB
without converging). Upgrades the pairs family's second-decade
evidence from build_rows to a value-level hash compare.

The decomposition is EXACT algebra over the same oracle SQL, not a
data assumption:

  1. post/dict     -- materialized once, globally (linear scans).
  2. sig           -- per-doc MinHash signatures from the GLOBAL
                      dictionary (grouped aggregate, linear).
  3. cand          -- the OR-of-bands self-join is rewritten as the
                      union of per-band equality joins + DISTINCT,
                      which is the definition of OR; each band join is
                      a plain hash join DuckDB sizes independently.
  4. ver           -- the candidate x postings x postings overlap
                      count, partitioned by doc_a % K. doc_a is a
                      GROUP KEY, so groups never cross partitions and
                      the union of partitioned aggregates equals the
                      global aggregate exactly.
  5. mhp           -- linear joins against per-doc shingle counts +
                      the j >= 0.8 threshold.
  6. compare       -- canon (sort cols by name, rows by stringified
                      values) against the Spark dump, same convention
                      as tools/check_oracle.py.

Every stage materializes to parquet under a scratch dir, so peak
memory is one stage's working set, never the whole chain's.

Usage:
  python3 tools/oracle_pairs_partitioned.py <sf_dir> <spark_dump_dir> \
      [--parts K] [--scratch DIR]

<spark_dump_dir> is graft.Verify's <outDir>/x_minhash_lsh_pairs.
Constants (8 perms / 4 bands, threshold 4/5, multiplier pools) are
read from the dumped oracle_sql.json next to the dump dir when
present, else regenerated from the registry SQL via a small parse --
they must match src/main/scala/graft/llm/DedupQueries.scala.
"""
import argparse
import glob
import json
import os
import re
import shutil
import sys
import time

import duckdb
import pandas as pd

P = 1000000007


def log(msg):
    print(f"[pairs-oracle {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def parse_sig_lines(oracle_sql):
    """Pull the `min((A * (sid % P) + B) % P) AS hN` lines out of the
    dumped oracle SQL so the multiplier pool can never drift from the
    registry's."""
    pat = re.compile(r"min\(\((\d+) \* \(sid % \d+\) \+ (\d+)\) % \d+\) AS h(\d+)")
    found = {}
    for m in pat.finditer(oracle_sql):
        a, b, i = int(m.group(1)), int(m.group(2)), int(m.group(3))
        found[i] = (a, b)
    if sorted(found) != list(range(len(found))) or not found:
        sys.exit(f"could not parse signature lines from oracle SQL ({sorted(found)})")
    return [found[i] for i in range(len(found))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("spark_dump_dir")
    ap.add_argument("--parts", type=int, default=32,
                    help="doc_a % K partitions for the verification join")
    ap.add_argument("--scratch", default="/tmp/pairs_oracle_scratch")
    ap.add_argument("--mem", default=os.environ.get("GRAFT_DUCKDB_MEM", "48GB"))
    args = ap.parse_args()

    dump_parent = os.path.dirname(args.spark_dump_dir.rstrip("/"))
    oracle_json = os.path.join(dump_parent, "oracle_sql.json")
    if not os.path.exists(oracle_json):
        sys.exit(f"missing {oracle_json} (run graft.Verify first)")
    oracle_sql = json.load(open(oracle_json))["x_minhash_lsh_pairs"]
    ab = parse_sig_lines(oracle_sql)
    perms = len(ab)
    bands = 4
    rpb = perms // bands
    log(f"parsed {perms} perms from the dumped oracle SQL; {bands} bands x {rpb} rows")

    scratch = args.scratch
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{args.mem}'")
    con.sql(f"SET temp_directory='{scratch}/duckdb_spill'")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{args.sf_dir}/documents.parquet'")

    # -- stage 1: global postings (same text pipeline as sidPostingsSql)
    t0 = time.time()
    con.sql(f"""
      COPY (
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS shingle
          FROM (SELECT doc_id, tok, generate_subscripts(tok, 1) AS i FROM toks)
          WHERE i + 2 <= len(tok)),
        dict AS (
          SELECT shingle, CAST(row_number() OVER (ORDER BY shingle) AS BIGINT) AS sid
          FROM (SELECT DISTINCT shingle FROM sh))
        SELECT s.doc_id, d2.sid FROM sh s JOIN dict d2 ON s.shingle = d2.shingle
      ) TO '{scratch}/post.parquet' (FORMAT parquet)""")
    n_post = con.sql(f"SELECT count(*) FROM '{scratch}/post.parquet'").fetchone()[0]
    log(f"stage 1 post: {n_post} postings in {time.time()-t0:.1f}s")

    # -- stage 2: global-dictionary signatures
    t0 = time.time()
    sig_cols = ",\n".join(
        f"min(({a} * (sid % {P}) + {b}) % {P}) AS h{i}" for i, (a, b) in enumerate(ab))
    con.sql(f"""
      COPY (
        SELECT doc_id, {sig_cols}
        FROM '{scratch}/post.parquet' GROUP BY doc_id
      ) TO '{scratch}/sig.parquet' (FORMAT parquet)""")
    log(f"stage 2 sig: {time.time()-t0:.1f}s")

    # -- stage 3: candidates as union-of-band-joins + DISTINCT
    t0 = time.time()
    band_selects = []
    for bnd in range(bands):
        cond = " AND ".join(
            f"a.h{rpb*bnd+r} = b.h{rpb*bnd+r}" for r in range(rpb))
        band_selects.append(f"""
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM '{scratch}/sig.parquet' a JOIN '{scratch}/sig.parquet' b
            ON a.doc_id < b.doc_id AND {cond}""")
    con.sql(f"""
      COPY (SELECT DISTINCT doc_a, doc_b FROM ({' UNION ALL '.join(band_selects)}))
      TO '{scratch}/cand.parquet' (FORMAT parquet)""")
    n_cand = con.sql(f"SELECT count(*) FROM '{scratch}/cand.parquet'").fetchone()[0]
    log(f"stage 3 cand: {n_cand} candidates in {time.time()-t0:.1f}s")

    # -- stage 4: verification overlap, partitioned by doc_a % K
    t0 = time.time()
    os.makedirs(f"{scratch}/ver")
    for k in range(args.parts):
        con.sql(f"""
          COPY (
            SELECT c.doc_a, c.doc_b, count(*) AS overlap
            FROM '{scratch}/cand.parquet' c
            JOIN '{scratch}/post.parquet' pa ON pa.doc_id = c.doc_a
            JOIN '{scratch}/post.parquet' pb ON pb.doc_id = c.doc_b AND pa.sid = pb.sid
            WHERE c.doc_a % {args.parts} = {k}
            GROUP BY 1, 2
          ) TO '{scratch}/ver/part{k}.parquet' (FORMAT parquet)""")
        if k % 8 == 7:
            log(f"stage 4 ver: partition {k+1}/{args.parts} done ({time.time()-t0:.1f}s)")
    log(f"stage 4 ver: all {args.parts} partitions in {time.time()-t0:.1f}s")

    # -- stage 5: jaccard + threshold
    t0 = time.time()
    con.sql(f"""
      COPY (
        WITH cnt AS (
          SELECT doc_id, count(*) AS n FROM '{scratch}/post.parquet' GROUP BY doc_id)
        SELECT v.doc_a, v.doc_b,
               CAST(v.overlap AS DOUBLE) / (ca.n + cb.n - v.overlap) AS jaccard
        FROM '{scratch}/ver/*.parquet' v
        JOIN cnt ca ON v.doc_a = ca.doc_id
        JOIN cnt cb ON v.doc_b = cb.doc_id
        WHERE 5 * v.overlap >= 4 * (ca.n + cb.n - v.overlap)
      ) TO '{scratch}/mhp.parquet' (FORMAT parquet)""")
    log(f"stage 5 mhp: {time.time()-t0:.1f}s")

    # -- stage 6: canon compare against the Spark dump
    if not glob.glob(f"{args.spark_dump_dir}/*.parquet"):
        sys.exit(f"no Spark dump at {args.spark_dump_dir}")
    got = con.sql(f"SELECT * FROM '{args.spark_dump_dir}/*.parquet'").df()
    want = con.sql(f"SELECT * FROM '{scratch}/mhp.parquet'").df()

    def canon(df):
        df = df[sorted(df.columns)]
        if len(df):
            df = df.sort_values(by=list(df.columns), ignore_index=True,
                                key=lambda s: s.astype(str))
        return df.reset_index(drop=True)

    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        sys.exit(f"FAIL x_minhash_lsh_pairs: cols {list(g.columns)} vs {list(w.columns)}")
    if len(g) != len(w):
        sys.exit(f"FAIL x_minhash_lsh_pairs: rows {len(g)} vs {len(w)}")
    neq = (g.astype(str) != w.astype(str))
    if neq.any().any():
        bad = neq.any(axis=1)
        for i in list(g.index[bad])[:3]:
            print("  spark:", dict(g.loc[i]))
            print("  duck :", dict(w.loc[i]))
        sys.exit(f"FAIL x_minhash_lsh_pairs: {int(bad.sum())}/{len(g)} rows differ")
    print(f"PASS x_minhash_lsh_pairs ({len(g)} rows, {len(g.columns)} cols) "
          f"via {args.parts}-way partitioned oracle over {args.sf_dir}")


if __name__ == "__main__":
    main()
