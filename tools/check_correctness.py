"""Local mirror of the driver's correctness gate.

For every entry in __spark_entry__.queries(): run the Spark query and (when
present) the DuckDB oracle on the same sf dir, then compare row count,
column names and an order-insensitive value hash.  Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for col in out.columns:
        if out[col].dtype == object:
            out[col] = out[col].astype(str)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    normalized = normalize(df)
    payload = normalized.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def bit_exact_report(sdf: pd.DataFrame, odf: pd.DataFrame) -> list:
    """Raw float64 bit-equality check (stricter than the value hash)."""
    import numpy as np

    cols = sorted(sdf.columns)

    def ordered(df: pd.DataFrame) -> pd.DataFrame:
        # sort via stringified view (array columns are unhashable/unsortable)
        if df.empty:
            return df[cols]
        key = pd.Series(df[cols].astype(str).values.tolist()).map("||".join)
        return df[cols].iloc[key.argsort(kind="stable")].reset_index(drop=True)

    s, o = ordered(sdf), ordered(odf)
    bad = []
    for col in cols:
        if s[col].dtype == "float64":
            a, b = s[col].to_numpy(), o[col].to_numpy()
            neq = ~((a == b) | (np.isnan(a) & np.isnan(b)))
            if neq.any():
                bad.append((col, int(neq.sum())))
    return bad


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--bitexact"]
    bitexact = "--bitexact" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    # the pinned-golden oracles (kmeans, IVF centroids) read a fixture
    # parquet at oracle-resolution time — align them with the sf under test
    # BEFORE the registry import resolves anything
    import os

    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    import __spark_entry__ as entrymod
    from document_automation_spark.session import build_session

    spark = build_session(app_name="correctness", master="local[8]", shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as err:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(err).__name__}: {err}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} cols={sorted(sdf.columns)} ({spark_s:.1f}s, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as err:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {type(err).__name__}: {err}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            ns, no = normalize(sdf), normalize(odf)
            if len(ns) == len(no):
                diff = (ns.astype(str) != no.astype(str)).any(axis=1)
                print(f"      first diffs ({int(diff.sum())} rows):")
                print(ns[diff].head(3).to_string())
                print(no[diff].head(3).to_string())
        if not problems and bitexact and len(sdf) == len(odf):
            bad = bit_exact_report(sdf, odf)
            if bad:
                problems.append(f"float bits differ: {bad}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok    {name}: rows={len(sdf)} hash={value_hash(sdf)} ({spark_s:.1f}s)")

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
