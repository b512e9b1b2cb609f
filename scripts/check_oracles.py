"""Mimic the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
column names, and an order-insensitive value hash."""

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from epstein_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    if len(df) == 0:
        return "empty"
    rows = sorted(df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    ok, bad = 0, 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            bad += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            m = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
            o = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
            if len(m) == len(o):
                for c in m.columns:
                    diff = (m[c].astype(str) != o[c].astype(str))
                    if diff.any():
                        i = diff.idxmax()
                        problems.append(f"first diff col={c} row={i}: {m[c][i]!r} vs {o[c][i]!r}")
                        break
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            bad += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            ok += 1
    print(f"\n{ok} ok, {bad} failed")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
