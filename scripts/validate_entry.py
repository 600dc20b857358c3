"""Dev harness replicating the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle at a given sf dir,
compare row count, schema width and order-insensitive values."""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from twitter_crawler_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.round(6) if len(df) else df
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark(cores=8, shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s) [no oracle — rows-only]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        a, b = _norm(sdf), _norm(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        # The driver's value hash is dtype/rendering-sensitive: an int64 Spark
        # column vs a float64 oracle column (DuckDB HUGEINT rendering) hashes
        # differently even when values are equal. Replicate that strictness.
        kind_drift = [
            c for c in a.columns
            if {a[c].dtype.kind, b[c].dtype.kind} == {"i", "f"}
        ]
        if kind_drift:
            failures.append(name)
            print(f"FAIL  {name}: int-vs-float dtype drift in {kind_drift} "
                  f"(spark {[str(a[c].dtype) for c in kind_drift]} vs "
                  f"oracle {[str(b[c].dtype) for c in kind_drift]})")
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"OK    {name}: {len(a)} rows ({dt:.1f}s)")
        except AssertionError as e:
            failures.append(name)
            msg = str(e).splitlines()
            print(f"FAIL  {name}: values differ — {msg[0] if msg else e}")
            merged = a.compare(b) if a.shape == b.shape else None
            if merged is not None and len(merged):
                print(merged.head(5))
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(main(sf, only))
