#!/usr/bin/env python3
"""Partitioned DuckDB oracle for the PAIRS-family queries at scales
where the one-shot CTE chain is measured-infeasible on a single node
(round 14: the sf10 candidate x shingle verification join spilled
>55 GB without converging). Upgrades a pairs query's second-decade
evidence from build_rows to a value-level hash compare.

Supported queries (--query):
  x_minhash_lsh_pairs  (default)  sig -> per-band joins -> verify
  x_dedup_ngram                   rare-shingle candidates -> verify
  x_containment                   same candidates; directed cut
                                  den*overlap >= num*n_inner over
                                  both orientations of each pair

The decomposition is EXACT algebra over the same oracle SQL, not a
data assumption:

  1. post          -- (doc_id, sid) postings via a global shingle
                      dictionary, materialized once (linear scans).
                      sid is a bijection of its shingle, so df
                      counts, overlaps and Jaccard are unchanged.
  2. candidates    -- minhash: the OR-of-bands self-join rewritten as
                      the union of per-band equality joins + DISTINCT
                      (the definition of OR; each band join is a
                      plain hash join DuckDB sizes independently).
                      ngram: the rare-shingle (df <= cap) self-join,
                      partitioned by sid % K + global DISTINCT (a
                      candidate found under two rare sids appears in
                      two partitions; DISTINCT over the union equals
                      the one-shot DISTINCT).
  3. ver           -- the candidate x postings x postings overlap
                      count, partitioned by doc_a % K. doc_a is a
                      GROUP KEY, so groups never cross partitions and
                      the union of partitioned aggregates equals the
                      global aggregate exactly.
  4. final         -- linear joins against per-doc shingle counts +
                      the num/den jaccard threshold (parsed from the
                      dumped SQL), projecting the query's columns.
  5. compare       -- canon (sort cols by name, rows by stringified
                      values) against the Spark dump, same convention
                      as tools/check_oracle.py.

Every constant that could drift from the registry (signature
multiplier pool, band count, rare-df cap, threshold fraction) is
PARSED from the dumped oracle_sql.json, never hardcoded; a parse that
does not match the expected structure exits loudly.

Every stage materializes to parquet under a scratch dir, so peak
memory is one stage's working set, never the whole chain's.

Usage:
  python3 tools/oracle_pairs_partitioned.py <sf_dir> <spark_dump_dir> \
      [--query NAME] [--parts K] [--scratch DIR]

<spark_dump_dir> is graft.Verify's <outDir>/<query_name>; the query
name defaults from the dump dir's basename when --query is omitted.
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
    found = {}
    for m in re.finditer(r"min\(\((\d+) \* \(sid % \d+\) \+ (\d+)\) % \d+\) AS h(\d+)",
                         oracle_sql):
        a, b, i = int(m.group(1)), int(m.group(2)), int(m.group(3))
        found[i] = (a, b)
    if sorted(found) != list(range(len(found))) or not found:
        sys.exit(f"could not parse signature lines from oracle SQL ({sorted(found)})")
    return [found[i] for i in range(len(found))]


def parse_bands(oracle_sql, perms):
    """Derive the band count from the dumped SQL's OR-of-bands join
    condition instead of hardcoding it (r15 ADVICE): each band group
    renders as `(a.hX = b.hX AND ...)`, so the group-opening pattern
    count IS the band count. The parsed structure is then asserted
    (equal-width consecutive groups covering h0..h{perms-1}) so a
    registry banding change can never silently band differently here.
    """
    starts = [int(m.group(1)) for m in
              re.finditer(r"\(a\.h(\d+) = b\.h\d+", oracle_sql)]
    bands = len(starts)
    if bands == 0 or perms % bands != 0:
        sys.exit(f"could not derive band structure: {bands} group starts "
                 f"{starts} over {perms} perms")
    rpb = perms // bands
    if starts != [rpb * b for b in range(bands)]:
        sys.exit(f"band groups are not equal-width consecutive: starts {starts}, "
                 f"expected {[rpb * b for b in range(bands)]}")
    return bands


def parse_threshold(oracle_sql):
    """The `num * overlap >= den * union` jaccard cut, parsed so the
    frozen 4/5 fraction cannot drift."""
    m = re.search(r"(\d+) \* v\.overlap >= (\d+) \*", oracle_sql)
    if not m:
        sys.exit("could not parse the jaccard threshold from oracle SQL")
    return int(m.group(1)), int(m.group(2))


def parse_containment_threshold(oracle_sql):
    """The directed `den * overlap >= num * n_inner` containment cut."""
    m = re.search(r"WHERE (\d+) \* overlap >= (\d+) \* n_inner", oracle_sql)
    if not m:
        sys.exit("could not parse the containment threshold from oracle SQL")
    return int(m.group(2)), int(m.group(1))  # (num, den)


def parse_rare_cap(oracle_sql):
    """The ngram query's rare-shingle df cap (`HAVING count(*) <= N`)."""
    m = re.search(r"HAVING count\(\*\) <= (\d+)", oracle_sql)
    if not m:
        sys.exit("could not parse the rare-shingle df cap from oracle SQL")
    return int(m.group(1))


def build_post(con, sf_dir, scratch):
    """Stage 1: global (doc_id, sid) postings — same text pipeline as
    sidPostingsSql, shared by both supported queries."""
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


def cand_minhash(con, scratch, oracle_sql):
    """Stages 2-3 (minhash): global-dictionary signatures, then the
    OR-of-bands join as a union of per-band hash joins + DISTINCT."""
    ab = parse_sig_lines(oracle_sql)
    perms = len(ab)
    bands = parse_bands(oracle_sql, perms)
    rpb = perms // bands
    log(f"parsed {perms} perms / {bands} bands x {rpb} rows from the dumped oracle SQL")

    t0 = time.time()
    sig_cols = ",\n".join(
        f"min(({a} * (sid % {P}) + {b}) % {P}) AS h{i}" for i, (a, b) in enumerate(ab))
    con.sql(f"""
      COPY (
        SELECT doc_id, {sig_cols}
        FROM '{scratch}/post.parquet' GROUP BY doc_id
      ) TO '{scratch}/sig.parquet' (FORMAT parquet)""")
    log(f"stage 2 sig: {time.time()-t0:.1f}s")

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


def cand_ngram(con, scratch, oracle_sql, parts):
    """Stages 2-3 (ngram): rare sids (df <= cap, parsed), then the
    rare-shingle candidate self-join partitioned by sid % K (shingle-
    range partitioning) + one global DISTINCT over the union."""
    cap = parse_rare_cap(oracle_sql)
    log(f"parsed rare-shingle df cap {cap} from the dumped oracle SQL")

    t0 = time.time()
    con.sql(f"""
      COPY (
        SELECT sid FROM '{scratch}/post.parquet'
        GROUP BY sid HAVING count(*) <= {cap}
      ) TO '{scratch}/rare.parquet' (FORMAT parquet)""")
    n_rare = con.sql(f"SELECT count(*) FROM '{scratch}/rare.parquet'").fetchone()[0]
    log(f"stage 2 rare: {n_rare} rare sids in {time.time()-t0:.1f}s")

    t0 = time.time()
    os.makedirs(f"{scratch}/candp")
    for k in range(parts):
        con.sql(f"""
          COPY (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM '{scratch}/rare.parquet' r
            JOIN '{scratch}/post.parquet' a ON a.sid = r.sid
            JOIN '{scratch}/post.parquet' b ON b.sid = r.sid AND a.doc_id < b.doc_id
            WHERE r.sid % {parts} = {k}
          ) TO '{scratch}/candp/part{k}.parquet' (FORMAT parquet)""")
        if k % 8 == 7:
            log(f"stage 3 cand: partition {k+1}/{parts} done ({time.time()-t0:.1f}s)")
    con.sql(f"""
      COPY (SELECT DISTINCT doc_a, doc_b FROM '{scratch}/candp/*.parquet')
      TO '{scratch}/cand.parquet' (FORMAT parquet)""")
    n_cand = con.sql(f"SELECT count(*) FROM '{scratch}/cand.parquet'").fetchone()[0]
    log(f"stage 3 cand: {n_cand} candidates in {time.time()-t0:.1f}s")


def verify_partitioned(con, scratch, parts):
    """Stage 4: exact overlap counts for every candidate, partitioned
    by doc_a % K (a group key, so the union equals the global agg)."""
    t0 = time.time()
    os.makedirs(f"{scratch}/ver")
    for k in range(parts):
        con.sql(f"""
          COPY (
            SELECT c.doc_a, c.doc_b, count(*) AS overlap
            FROM '{scratch}/cand.parquet' c
            JOIN '{scratch}/post.parquet' pa ON pa.doc_id = c.doc_a
            JOIN '{scratch}/post.parquet' pb ON pb.doc_id = c.doc_b AND pa.sid = pb.sid
            WHERE c.doc_a % {parts} = {k}
            GROUP BY 1, 2
          ) TO '{scratch}/ver/part{k}.parquet' (FORMAT parquet)""")
        if k % 8 == 7:
            log(f"stage 4 ver: partition {k+1}/{parts} done ({time.time()-t0:.1f}s)")
    log(f"stage 4 ver: all {parts} partitions in {time.time()-t0:.1f}s")


def final_select(query):
    """Stage 5 projection per query — must match the registry SQL's
    output columns exactly (the compare sorts columns by name)."""
    if query == "x_minhash_lsh_pairs":
        return """SELECT v.doc_a, v.doc_b,
               CAST(v.overlap AS DOUBLE) / (ca.n + cb.n - v.overlap) AS jaccard"""
    if query == "x_dedup_ngram":
        return """SELECT v.doc_a, v.doc_b, v.overlap, ca.n AS n_a, cb.n AS n_b,
               CAST(v.overlap AS DOUBLE) / (ca.n + cb.n - v.overlap) AS jaccard"""
    sys.exit(f"unsupported query {query}")


def final_containment(con, scratch, oracle_sql):
    """x_containment's stage 5: both orientations of every verified
    candidate pair, kept when den*overlap >= num*n_inner (threshold
    parsed). Plain union algebra over the same ver partitions."""
    num, den = parse_containment_threshold(oracle_sql)
    log(f"containment cut: {den}*overlap >= {num}*n_inner")
    con.sql(f"""
      COPY (
        WITH cnt AS (
          SELECT doc_id, count(*) AS n FROM '{scratch}/post.parquet' GROUP BY doc_id),
        full_p AS (
          SELECT v.doc_a, v.doc_b, v.overlap, ca.n AS n_a, cb.n AS n_b
          FROM '{scratch}/ver/*.parquet' v
          JOIN cnt ca ON v.doc_a = ca.doc_id
          JOIN cnt cb ON v.doc_b = cb.doc_id),
        dirs AS (
          SELECT doc_a AS doc_inner, doc_b AS doc_outer, overlap,
                 n_a AS n_inner, n_b AS n_outer FROM full_p
          UNION ALL
          SELECT doc_b, doc_a, overlap, n_b, n_a FROM full_p)
        SELECT doc_inner, doc_outer, overlap, n_inner, n_outer,
               CAST(overlap AS DOUBLE) / n_inner AS containment
        FROM dirs WHERE {den} * overlap >= {num} * n_inner
      ) TO '{scratch}/final.parquet' (FORMAT parquet)""")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("spark_dump_dir")
    ap.add_argument("--query", default=None,
                    help="registry query name (default: dump dir basename)")
    ap.add_argument("--parts", type=int, default=32,
                    help="partition count for the sid/doc_a modulo splits")
    ap.add_argument("--scratch", default="/tmp/pairs_oracle_scratch")
    ap.add_argument("--mem", default=os.environ.get("GRAFT_DUCKDB_MEM", "48GB"))
    args = ap.parse_args()

    query = args.query or os.path.basename(args.spark_dump_dir.rstrip("/"))
    if query not in ("x_minhash_lsh_pairs", "x_dedup_ngram", "x_containment"):
        sys.exit(f"unsupported query {query} "
                 "(x_minhash_lsh_pairs | x_dedup_ngram | x_containment)")

    dump_parent = os.path.dirname(args.spark_dump_dir.rstrip("/"))
    oracle_json = os.path.join(dump_parent, "oracle_sql.json")
    if not os.path.exists(oracle_json):
        sys.exit(f"missing {oracle_json} (run graft.Verify first)")
    oracle_sql = json.load(open(oracle_json))[query]
    if query != "x_containment":
        num, den = parse_threshold(oracle_sql)
        log(f"query {query}: jaccard cut {num}*overlap >= {den}*union")

    scratch = args.scratch
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{args.mem}'")
    con.sql(f"SET temp_directory='{scratch}/duckdb_spill'")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{args.sf_dir}/documents.parquet'")

    build_post(con, args.sf_dir, scratch)
    if query == "x_minhash_lsh_pairs":
        cand_minhash(con, scratch, oracle_sql)
    else:
        cand_ngram(con, scratch, oracle_sql, args.parts)
    verify_partitioned(con, scratch, args.parts)

    # -- stage 5: per-doc counts + threshold + the query's projection
    t0 = time.time()
    if query == "x_containment":
        final_containment(con, scratch, oracle_sql)
    else:
        con.sql(f"""
          COPY (
            WITH cnt AS (
              SELECT doc_id, count(*) AS n FROM '{scratch}/post.parquet' GROUP BY doc_id)
            {final_select(query)}
            FROM '{scratch}/ver/*.parquet' v
            JOIN cnt ca ON v.doc_a = ca.doc_id
            JOIN cnt cb ON v.doc_b = cb.doc_id
            WHERE {num} * v.overlap >= {den} * (ca.n + cb.n - v.overlap)
          ) TO '{scratch}/final.parquet' (FORMAT parquet)""")
    log(f"stage 5 final: {time.time()-t0:.1f}s")

    # -- stage 6: canon compare against the Spark dump
    if not glob.glob(f"{args.spark_dump_dir}/*.parquet"):
        sys.exit(f"no Spark dump at {args.spark_dump_dir}")
    got = con.sql(f"SELECT * FROM '{args.spark_dump_dir}/*.parquet'").df()
    want = con.sql(f"SELECT * FROM '{scratch}/final.parquet'").df()

    def canon(df):
        df = df[sorted(df.columns)]
        if len(df):
            df = df.sort_values(by=list(df.columns), ignore_index=True,
                                key=lambda s: s.astype(str))
        return df.reset_index(drop=True)

    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        sys.exit(f"FAIL {query}: cols {list(g.columns)} vs {list(w.columns)}")
    if len(g) != len(w):
        sys.exit(f"FAIL {query}: rows {len(g)} vs {len(w)}")
    neq = (g.astype(str) != w.astype(str))
    if neq.any().any():
        bad = neq.any(axis=1)
        for i in list(g.index[bad])[:3]:
            print("  spark:", dict(g.loc[i]))
            print("  duck :", dict(w.loc[i]))
        sys.exit(f"FAIL {query}: {int(bad.sum())}/{len(g)} rows differ")
    print(f"PASS {query} ({len(g)} rows, {len(g.columns)} cols) "
          f"via {args.parts}-way partitioned oracle over {args.sf_dir}")


if __name__ == "__main__":
    main()
