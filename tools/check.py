#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify output
against DuckDB oracles. Usage: check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Fail-loud guard (r13: an empty gate artifact closed the round
    # blind): an empty oracles map or a dir with zero query outputs is
    # a broken invocation, not a 0-query pass.
    if not oracles:
        print(f"REFUSED: {out_dir}/oracle_sql.json has an EMPTY oracles map",
              file=sys.stderr)
        return 1
    if not any(glob.glob(f"{out_dir}/{n}/*.parquet") for n in oracles):
        print(f"REFUSED: {out_dir} contains no query output dirs for any "
              f"of the {len(oracles)} oracles - Verify did not run here",
              file=sys.stderr)
        return 1
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pq.read_table(files[0]).to_pylist()
        try:
            want_rel = con.sql(sql)
            want_cols = want_rel.columns
            # Type lint: an uncast sum() yields HUGEINT, which the driver's
            # type-sensitive hasher serializes differently than BIGINT even
            # when values are identical (round-8 root cause). Fail loudly.
            bad_types = [f"{c}:{t}" for c, t in zip(want_cols, want_rel.types)
                         if "HUGEINT" in str(t).upper()
                         or "DECIMAL" in str(t).upper()]
            if bad_types:
                print(f"FAIL {name}: oracle emits HUGEINT/DECIMAL columns "
                      f"{bad_types} - CAST sums to BIGINT, literals/decimal "
                      f"aggregates to DOUBLE (or render fixed-scale strings)")
                n_fail += 1
                continue
            want = [dict(zip(want_cols, r)) for r in want_rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gcols = sorted(got[0].keys()) if got else []
        wcols = sorted(want_cols)
        if got and gcols != wcols:
            print(f"FAIL {name}: cols {gcols} vs {wcols}")
            n_fail += 1
            continue
        g = sorted(tuple(norm(r[c]) for c in gcols) for r in got)
        w = sorted(tuple(norm(r[c]) for c in wcols) for r in want)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first: {bad[0][0]} vs {bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
