"""Local twin of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet dir, then compares
row count, column names/kinds, and sorted values (exact for
ints/strings/timestamps, bit-tolerant 1e-9 for floats).

Usage: python tests/compare_harness.py [sf0.001|sf0.01] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the ONE base-table registry (duplicating the list here once cost a
# lockstep edit per new driver table — code-review r5)
from kmertools_spark.sources.transcripts import BASE_TABLES as TABLES  # noqa: E402


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            # nullable Int64 (not float64): keeps 64-bit values exact
            # (xxhash64-scale ints would be lossy past 2^53) and keeps
            # int-vs-float dtype mismatches visible in compare()
            df[c] = df[c].astype("Int64")
    # Sort rows by the NON-float columns first, then by floats ROUNDED
    # to the comparison tolerance: sorting on exact floats could align
    # the two engines' rows differently whenever two rows' floats sit
    # within the 1e-9 tolerance of each other, producing spurious
    # mismatches in every other column (code-review r5).
    float_cols = [c for c in df.columns if df[c].dtype.kind == "f"]
    keyframe = df[[c for c in df.columns if c not in float_cols]].copy()
    for c in float_cols:
        keyframe[f"__s_{c}"] = df[c].round(9)
    order = keyframe.sort_values(list(keyframe.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if len(a) != len(b):
        problems.append(f"rowcount spark={len(a)} duck={len(b)}")
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns spark={sorted(a.columns)} duck={sorted(b.columns)}")
        return problems
    if problems:
        return problems
    # exact integer-width parity BEFORE normalize widens to Int64: the
    # driver gate compares dtypes exactly (CLAUDE.md: CAST counts to
    # BIGINT), so an int32-vs-int64 drift must fail HERE, not only on
    # the driver (code-review r5)
    for c in sorted(a.columns):
        if pd.api.types.is_integer_dtype(a[c]) and pd.api.types.is_integer_dtype(b[c]):
            aw = a[c].dtype.itemsize
            bw = b[c].dtype.itemsize
            if aw != bw:
                problems.append(
                    f"col {c} int width spark={a[c].dtype} duck={b[c].dtype}"
                )
    if problems:
        return problems
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        ak = "i" if isinstance(a[c].dtype, pd.Int64Dtype) else a[c].dtype.kind
        bk = "i" if isinstance(b[c].dtype, pd.Int64Dtype) else b[c].dtype.kind
        if ak != bk:
            problems.append(f"col {c} dtype kind spark={ak} duck={bk}")
            continue
        if ak == "f":
            av = a[c].to_numpy("float64")
            bv = b[c].to_numpy("float64")
            nan_ok = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-12) | nan_ok
            if not close.all():
                i = int(np.flatnonzero(~close)[0])
                problems.append(
                    f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}"
                )
        elif ak == "i":
            av, bv = a[c], b[c]
            # fillna(False): a null-vs-value mismatch must report as a
            # failing row, not crash the harness mid-run
            eq = (
                ((av == bv) | (av.isna() & bv.isna()))
                .fillna(False)
                .to_numpy(dtype=bool)
            )
            if not eq.all():
                i = int(np.flatnonzero(~eq)[0])
                problems.append(f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}")
        else:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            eq = av == bv
            if not eq.all():
                i = int(np.flatnonzero(~eq)[0])
                problems.append(f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}")
    return problems


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
    sf_dir = f"/root/testdata/{sf}"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from kmertools_spark.session import get_spark

    spark = get_spark("compare-harness", master="local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd filter used to skip everything and print a SILENT
        # green "FAILURES: 0" (code-review r5)
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        spark.stop()
        return 2
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0 and not name.endswith("empty_ok"):
                print(f"  WARN {name}: zero rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            for p in problems[:4]:
                print(f"  {p}")
        else:
            print(f"OK   {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                # both engines agreeing on ZERO rows proves nothing
                # about the operator — surface it (code-review r5)
                print(f"  WARN {name}: oracle compare passed on 0 rows")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
