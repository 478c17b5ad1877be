"""Round-11 optimization measurement harness (guide §1).

Times registered queries with the noop sink (computes every column, no sink
cost — guide §1.4) and dumps ``explain("formatted")`` per query. Unlike
bench.py (count()-timed, best-of-5, driver-comparable), this is the
*optimization* instrument: noop forces full column computation so plan
changes can't hide behind count()'s column pruning.

Usage:
  python measure_r11.py [--names n1,n2,...] [--runs 3] [--plans-dir plans/r11]
                        [--suffix _before] [--no-time]
Writes one JSON line per query to stdout and a final summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--raw-dir", action="store_true",
                    help="use $SPARK_GRAFT_SF_DIR directly, skip bench split")
    args = ap.parse_args()

    import bench
    from feature_datalake_sl_mandic_spark import registry
    from feature_datalake_sl_mandic_spark.session import get_spark, release_cached

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-measure")
    data_dir = sf_dir if args.raw_dir else bench.prepare_bench_dir(spark, sf_dir)

    specs = registry.load_all()
    names = [n for n in args.names.split(",") if n] or sorted(specs)
    plans_dir = Path(args.plans_dir) if args.plans_dir else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    # One warm pass: JVM + codegen + parquet footers (mirrors bench.py).
    specs[names[0]].fn(spark, data_dir).limit(1).count()
    if "q3_shipping_priority" in specs:
        specs["q3_shipping_priority"].fn(spark, data_dir).count()
        release_cached(spark)

    out = {}
    for name in names:
        spec = specs[name]
        if plans_dir:
            try:
                from feature_datalake_sl_mandic_spark.plans import formatted_plan

                df = spec.fn(spark, data_dir)
                (plans_dir / f"{name}{args.suffix}.txt").write_text(
                    formatted_plan(df)
                )
            except Exception as e:  # noqa: BLE001
                (plans_dir / f"{name}{args.suffix}.txt").write_text(
                    f"EXPLAIN ERROR {type(e).__name__}: {e}"
                )
            release_cached(spark)
        if args.no_time:
            continue
        ts = []
        err = None
        for _ in range(args.runs):
            try:
                spark.sparkContext.setJobDescription(f"r11-measure:{name}")
                t0 = time.perf_counter()
                df = spec.fn(spark, data_dir)
                df.write.format("noop").mode("overwrite").save()
                ts.append(round(time.perf_counter() - t0, 4))
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"
                break
            finally:
                spark.sparkContext.setJobDescription(None)
                release_cached(spark)
        rec = {"name": name, "noop_min": min(ts) if ts else None,
               "runs": ts, "err": err}
        out[name] = rec
        print(json.dumps(rec), flush=True)

    if not args.no_time:
        ranked = sorted(
            ((r["noop_min"] or 9e9, n) for n, r in out.items()), reverse=True
        )
        print(json.dumps({
            "summary": "noop_min_ranked",
            "total_noop_min": round(sum(r["noop_min"] or 0 for r in out.values()), 3),
            "top": [[n, t] for t, n in ranked[:40]],
        }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
