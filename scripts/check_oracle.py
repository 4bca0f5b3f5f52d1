#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate — STRICTER than
the driver, on purpose.

Runs each oracle_sql.json query in DuckDB over the same sf dir and
compares against the engine's parquet dumps: row count, schema (column
names), and a value hash with columns sorted by name.

r16 lesson: the original renderer formatted floats with "%.10g", which
collapses 78.0 (a DuckDB HUGEINT surfacing as float64 in pandas) and
78 (a Spark BIGINT) to the same token — exactly the divergence that
shipped three driver-red rows in r15 (q218/q242/q244: bare SUM(int)
in the oracle's outermost SELECT). The renderer now uses full-precision
repr and does NOT collapse integral floats into ints, so an engine/
oracle dtype mismatch or a last-ULP double difference fails HERE
before it can fail at the driver. A query that passes this gate passes
any weaker renderer.

Usage: python3 scripts/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # strict rendering: ints as ints, floats at full repr precision
    # ("78" != "78.0" — the r15 HUGEINT hazard), NaN/None both NULL
    # (inside a float64 column pandas cannot distinguish them on
    # EITHER side, so the collapse is symmetric and lossless)
    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if pd.isna(v):
                return "NULL"
            return repr(float(v))
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "NULL"
        return str(v)
    rows = df.apply(lambda r: "|".join(render(v) for v in r), axis=1)
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    results = {}
    names = sorted(os.listdir(out_dir))
    for name in names:
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            continue
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            results[name] = "NO_ENGINE_OUTPUT"
            n_fail += 1
            continue
        eng = pd.concat([pd.read_parquet(p) for p in sorted(files)])
        if name not in oracle:
            results[name] = f"rows_only rows={len(eng)}"
            continue
        try:
            ora = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            n_fail += 1
            continue
        problems = []
        if len(eng) != len(ora):
            problems.append(f"rows {len(eng)} vs {len(ora)}")
        if sorted(eng.columns) != sorted(ora.columns):
            problems.append(f"cols {sorted(eng.columns)} vs {sorted(ora.columns)}")
        else:
            he, ho = canon(eng), canon(ora)
            if he != ho:
                problems.append(f"hash {he} vs {ho}")
        if problems:
            results[name] = "FAIL: " + "; ".join(problems)
            n_fail += 1
        else:
            results[name] = "OK"
            n_pass += 1

    for name, r in sorted(results.items()):
        print(f"{name:24s} {r}")
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{sum(1 for r in results.values() if r.startswith('rows_only'))} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
