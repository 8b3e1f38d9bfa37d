"""Local stand-in for the driver's correctness gate: run every queries()
entry against its oracle_sql() in DuckDB at a given SF and compare
row-count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return ""
        return f"{v:.6f}"
    return str(v)


def _norm_df(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return list(pdf.columns), rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from cex_crawler_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(sdf) >= 0
            print(f"rows-only {name}: {len(sdf)} rows")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        scols, srows = _norm_df(sdf)
        ocols, orows = _norm_df(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        if srows != orows:
            bad = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first:")
            for i in bad[:3]:
                print(f"   spark : {srows[i]}")
                print(f"   oracle: {orows[i]}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(srows)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
