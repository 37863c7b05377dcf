#!/usr/bin/env python3
"""Oracle result-type lint: run every oracle SQL through DuckDB (types
only, no value fetch needed beyond the relation's schema) and fail if
any output column is HUGEINT/UHUGEINT or DECIMAL. An uncast sum()
over BIGINT yields HUGEINT, which the driver's type-sensitive hasher
serializes differently than int64 even when values match (round-8 root
cause: kdb_rfm, q_late_by_status, llm_dedup_triangles); DECIMAL
outputs (bare numeric literals, decimal aggregates) surface as float64
in the driver's pandas compare while Spark parquet keeps Decimal
(round-4 q_decimal_money lesson).

Usage: lint_oracle_types.py <sfDir> <oracle_sql.json>
"""
import sys, json
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(oracle_json))
    n_bad = n_err = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
        except Exception as e:
            # A broken oracle is the gate's job to flag; here we only
            # care about types, but surface it anyway.
            print(f"ERR  {name}: {e}")
            n_err += 1
            continue
        bad = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
               if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()]
        if bad:
            print(f"BAD  {name}: {bad} - HUGEINT needs CAST(... AS BIGINT); "
                  f"DECIMAL (bare numeric literals, decimal sums) surfaces as "
                  f"float64/Decimal inconsistently across the driver compare "
                  f"(r4 q_decimal_money lesson) - CAST to DOUBLE or render a "
                  f"fixed-scale string")
            n_bad += 1
    print(f"== lint: {len(oracles)} oracles, {n_bad} type offenders, {n_err} errors ==")
    return 1 if (n_bad or n_err) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
