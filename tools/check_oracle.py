"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF dir and
compares against ``oracle_sql()`` via DuckDB: row count, column names,
and an order-insensitive value comparison (exact for non-floats, exact
AND abs-diff report for floats, since the engine pins deterministic
aggregation — see plans/compiler.py).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "timestamp")):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # The driver's value hash is dtype-sensitive: an int64 Spark column
        # vs a float64 oracle column (e.g. DuckDB SUM(int) -> HUGEINT ->
        # float64 in pandas) hash-mismatches even when values are equal.
        # Catch that class here so it can't pass locally and fail the gate.
        skind, okind = sv.dtype.kind, ov.dtype.kind
        if {skind, okind} == {"i", "f"} or {skind, okind} == {"u", "f"}:
            problems.append(
                f"col {c}: dtype kind mismatch spark={sv.dtype} oracle={ov.dtype}"
                " (driver hash would fail — CAST the oracle aggregate)"
            )
            continue
        if str(sv.dtype).startswith("float") or str(ov.dtype).startswith("float"):
            svf = pd.to_numeric(sv, errors="coerce")
            ovf = pd.to_numeric(ov, errors="coerce")
            if not ((svf.isna() == ovf.isna()).all()):
                problems.append(f"col {c}: null pattern differs")
                continue
            diff = (svf - ovf).abs().max()
            if not (svf.fillna(0) == ovf.fillna(0)).all():
                problems.append(f"col {c}: float values differ (max abs diff {diff})")
        else:
            try:
                eq = (sv.fillna("<NULL>") == ov.fillna("<NULL>")).all()
            except Exception:
                eq = list(sv) == list(ov)
            if not eq:
                bad = [(a, b) for a, b in zip(sv, ov) if a != b and not (pd.isna(a) and pd.isna(b))][:3]
                problems.append(f"col {c}: values differ, e.g. {bad}")
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--skip=")]
    skip: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip="):
            skip |= set(a[len("--skip="):].split(","))
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from salesforce_prefect_etl_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    from salesforce_prefect_etl_pipeline_spark.operators.multimodal import (
        FamilySizeError,
    )

    queries, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    n_run = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name in skip:
            print(f"SKIP {name}: excluded by --skip")
            continue
        n_run += 1
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except FamilySizeError as ex:
            # the quadratic-output pair form refusing a family-heavy
            # corpus is designed behavior, not a failure (see
            # multimodal.ahash_near_dup_pairs); fires on the sf1
            # scaling fixture, never at driver/oracle scales
            n_run -= 1
            print(f"SKIP {name}: output guard refused this corpus ({ex})")
            continue
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            oracle_pdf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"   - {p}")
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{n_run - n_fail}/{n_run} ok")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
