#!/usr/bin/env python3
"""Emit a driver-format correctness snapshot (CORRECTNESS_rNN.json)
from a Verify output dir: per query {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err} — the same gate logic as
check.py, serialized the way the driver records it so round-close
snapshots stay comparable across rounds (the r7 continuity lesson).

Usage: emit_correctness.py <sfDir> <verifyOutDir> <outJson>
"""
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


def main(sf_dir, out_dir, out_json):
    # Fail-loud guards (r13 lesson: the driver's CORRECTNESS_r13.json
    # landed as a literal "{}" and the round closed blind). An empty
    # oracles map, a verify dir with no query dirs, or a _PARTIAL
    # stamp (GRAFT_ONLY subset run) must never serialize as a
    # plausible snapshot: exit non-zero and write NOTHING.
    import os
    if os.path.exists(f"{out_dir}/_PARTIAL"):
        print(f"REFUSED: {out_dir} is a GRAFT_ONLY partial run "
              f"(_PARTIAL stamp present) - not a gradable gate",
              file=sys.stderr)
        return 1
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not oracles:
        print(f"REFUSED: {out_dir}/oracle_sql.json has an EMPTY oracles "
              f"map - refusing to write an empty snapshot", file=sys.stderr)
        return 1
    qdirs = [n for n in oracles if glob.glob(f"{out_dir}/{n}/*.parquet")]
    if not qdirs:
        print(f"REFUSED: {out_dir} contains no query output dirs for any "
              f"of the {len(oracles)} oracles - Verify did not run here",
              file=sys.stderr)
        return 1
    result = {}
    for name, sql in sorted(oracles.items()):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": 0, "oracle_rows": 0,
               "err": None}
        result[name] = rec
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            rec["err"] = "no spark output"
            continue
        got = pq.read_table(files[0]).to_pylist()
        rec["spark_rows"] = len(got)
        try:
            want_rel = con.sql(sql)
            want_cols = want_rel.columns
            want = [dict(zip(want_cols, r)) for r in want_rel.fetchall()]
        except Exception as e:
            rec["err"] = f"oracle error: {e}"
            continue
        rec["oracle_rows"] = len(want)
        rec["rows_match"] = len(got) == len(want)
        gcols = sorted(got[0].keys()) if got else sorted(want_cols)
        wcols = sorted(want_cols)
        rec["schema_match"] = gcols == wcols
        if rec["rows_match"] and rec["schema_match"]:
            g = sorted(tuple(norm(r[c]) for c in gcols) for r in got)
            w = sorted(tuple(norm(r[c]) for c in wcols) for r in want)
            rec["hash_match"] = g == w
    json.dump(result, open(out_json, "w"), indent=1)
    n = len(result)
    ok = sum(1 for r in result.values()
             if r["rows_match"] and r["schema_match"] and r["hash_match"])
    print(f"== snapshot {out_json}: {ok}/{n} full pass ==")
    return 0 if ok == n else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
