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


# --- REAL-precision fold guard (round-7 verdict ask #7) -------------------
#
# Bug class (found round 6, fixed at every then-existing site): DuckDB's
# `embedding` views are REAL[] (float32). An oracle that multiplies two
# un-cast list elements — `x -> x * x`, or `(x * x)::DOUBLE` with the cast
# OUTSIDE the product — squares in REAL precision first, so subnormal
# entries (|x| < ~4e-23) underflow to exactly 0.0 while Spark's
# array<double> path keeps them nonzero, and the engines silently disagree
# on e.g. nonzero-vector exclusion sets. The correct spelling casts each
# operand BEFORE multiplying: `x -> x::DOUBLE * x::DOUBLE`. These regexes
# make the class mechanically un-reintroducible: tests fail on any
# registered oracle whose text (when it touches an embedding column)
# contains an un-cast lambda product or a cast-after-product.
import re as _re

# `( x * x )::DOUBLE` — cast applied after the REAL-precision product. This
# spelling is banned uniformly in embedding-touching texts (even where the
# operands happen to be DOUBLE) so reviews never reason about promotion
# order; zero legitimate instances exist in the registry.
_CAST_AFTER_PRODUCT = _re.compile(
    r"\(\s*\w+\s*\*\s*[\w.:]+\s*\)\s*::\s*DOUBLE", _re.IGNORECASE
)
# An operand participating in `*` without its own element cast: identifier
# directly left of `*` not reached through `::`, or identifier directly
# right of `*` not followed by `::`.
_UNCAST_OPERAND = _re.compile(r"(?<!:)\b\w+\s*\*|\*\s*\w+\b(?!\s*::)")
_EMBEDDING_WORD = _re.compile(r"\bembedding\b")


def _lambda_regions(sql: str):
    """Yield (list_args_text, body_text) for every `->` lambda in sql.

    list_args_text = everything inside the enclosing function call that
    precedes the lambda (the list argument(s) the lambda folds over);
    body_text = the lambda body up to the call's top-level `,` or `)`.
    Paren-aware so nested calls like list_sum(list_transform(...)) resolve
    to the INNER call's argument.
    """
    for m in _re.finditer(r"->", sql):
        depth = 0
        start = None
        for i in range(m.start() - 1, -1, -1):
            c = sql[i]
            if c == ")":
                depth += 1
            elif c == "(":
                depth -= 1
                if depth < 0:
                    start = i + 1
                    break
        if start is None:
            continue
        depth = 0
        end = len(sql)
        for j in range(m.end(), len(sql)):
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = j
                    break
                depth -= 1
            elif c == "," and depth == 0:
                end = j
                break
        yield sql[start : m.start()], sql[m.end() : end]


def real_precision_folds(sql: str) -> list[str]:
    """Offending snippets (empty = clean) for the REAL-precision fold class.

    Scoped to texts that read an embedding column — the lake's only REAL
    storage. Flags (a) any `(a * b)::DOUBLE` cast-after-product, and (b) a
    lambda whose enclosing call takes the raw `embedding` column directly
    and whose body multiplies an operand lacking its own `::DOUBLE` cast.
    Lists already cast element-wise in a CTE (the registry convention:
    `list_transform(embedding, x -> x::DOUBLE) AS emb`) are DOUBLE and out
    of scope; the degenerate-embeddings suite remains the semantic backstop
    for REAL lists smuggled through un-cast aliases.
    """
    if "embedding" not in sql:
        return []
    hits = [m.group(0) for m in _CAST_AFTER_PRODUCT.finditer(sql)]
    for list_args, body in _lambda_regions(sql):
        if _EMBEDDING_WORD.search(list_args) and _UNCAST_OPERAND.search(body):
            snippet = f"{list_args.strip()[:60]} -> {body.strip()[:60]}"
            hits.append(snippet)
    return hits


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
