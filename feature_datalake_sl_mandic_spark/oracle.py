"""Oracle-differential self-check: mirror of the driver's correctness gate.

Runs each registered query's DataFrame plan on Spark AND its oracle SQL on
DuckDB over the same parquet files, then compares row count, column names and
(order-insensitively) values. Used by tests/test_oracle_parity.py and the
``python -m feature_datalake_sl_mandic_spark.oracle`` CLI so mismatches are
caught locally before the driver's per-round check.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from feature_datalake_sl_mandic_spark.catalog import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    # order-insensitive: sort rows by stringified values (stable across engines)
    if len(df):
        key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
        df = df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        errs.append(f"{name}: columns differ spark={list(a.columns)} duck={list(b.columns)}")
        return errs
    if len(a) != len(b):
        errs.append(f"{name}: row count spark={len(a)} duck={len(b)}")
        return errs
    for col in a.columns:
        da, db = str(a[col].dtype), str(b[col].dtype)
        if da != db:
            errs.append(
                f"{name}.{col}: WARNING dtype spark={da} duck={db} — align casts "
                "in case the driver's schema check is type-strict"
            )
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = pd.to_numeric(av, errors="coerce").astype(float)
            bf = pd.to_numeric(bv, errors="coerce").astype(float)
            bad = 0
            worst = 0.0
            exact = True
            for x, y in zip(af, bf):
                if (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                ):
                    continue
                if x != y:
                    exact = False
                    denom = max(abs(x), abs(y), 1.0)
                    rel = abs(x - y) / denom
                    worst = max(worst, rel)
                    if rel > 1e-9:
                        bad += 1
            if bad:
                errs.append(f"{name}.{col}: {bad} values differ (worst rel {worst:.2e})")
            elif not exact:
                errs.append(
                    f"{name}.{col}: WARNING not bit-exact (worst rel {worst:.2e}) — "
                    "driver hash may flag this; tighten rounding"
                )
        else:
            eq = av.astype(str).values == bv.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                errs.append(
                    f"{name}.{col}: {int((~eq).sum())} values differ, e.g. row {i}: "
                    f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                )
    return errs


def run_parity(sf_dir: str, only: list[str] | None = None, spark=None) -> dict[str, list[str]]:
    from feature_datalake_sl_mandic_spark import registry
    from feature_datalake_sl_mandic_spark.session import get_spark, release_cached

    spark = spark or get_spark("oracle-parity")
    con = duck_connection(sf_dir)
    results: dict[str, list[str]] = {}
    for name, spec in sorted(registry.load_all().items()):
        if only and name not in only:
            continue
        try:
            spdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: SPARK ERROR {type(e).__name__}: {e}"]
            continue
        finally:
            # keep the 212-query sweep's executor-storage footprint flat:
            # localCheckpoint blocks from this query die here, not at GC time
            release_cached(spark)
        if spec.oracle is None:
            results[name] = [] if len(spdf) >= 0 else [f"{name}: no rows"]
            continue
        try:
            dkdf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"{name}: DUCK ERROR {type(e).__name__}: {e}"]
            continue
        results[name] = compare(spdf, dkdf, name)
    return results


def main() -> int:
    import sys

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    only = sys.argv[1:] or None
    results = run_parity(sf_dir, only)
    fails = 0
    for name, errs in sorted(results.items()):
        status = "OK" if not errs else ("WARN" if all("WARNING" in e for e in errs) else "FAIL")
        if status != "OK":
            fails += status == "FAIL"
        print(f"[{status}] {name}")
        for e in errs:
            print(f"    {e}")
    print(f"{len(results)} queries, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
