"""Self-check: run every queries() entry against its oracle_sql() in DuckDB
at sf0.01 and compare row count, schema (column names), and a value hash —
mimicking the driver's CORRECTNESS gate so mismatches surface locally first.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    # normalize cell values to stable strings
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "\\N"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            try:
                v = list(v.tolist() if hasattr(v, "tolist") else v)
            except Exception:
                pass
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    try:
        rows = sorted(
            "\x1f".join(cell(v) for v in rec) for rec in df.itertuples(index=False, name=None)
        )
    except Exception:
        rows = ["<unsortable>"]
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import __spark_entry__ as entry
    from clinvar_ingest_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qmap = entry.queries()
    omap = entry.oracle_sql()
    failures = 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in omap:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check, no oracle)")
            continue
        try:
            odf = con.execute(omap[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        if (sn, sc, sh) == (on, oc, oh):
            print(f"OK    {name}: {sn} rows, hash {sh}")
        else:
            failures += 1
            print(f"FAIL  {name}: spark=({sn},{sc},{sh}) oracle=({on},{oc},{oh})")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
