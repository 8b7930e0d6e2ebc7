"""Smoke runner — the reference's ``run_multiple_times.py`` equivalent
(/root/reference/run_multiple_times.py:1-5): three consecutive
orchestrated runs against the same source, exercising the run-metadata
log and the row-count drift state ACROSS runs (run 2+ must see run 1's
row count and report drift=0 on identical input).

Usage: python run_multiple_times.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "out/smoke_runs"
    from salesforce_prefect_etl_pipeline_spark.flows.pipeline import run_pipeline
    from salesforce_prefect_etl_pipeline_spark.session import get_spark
    from salesforce_prefect_etl_pipeline_spark.specs import SPECS

    spark = get_spark("smoke-runner")
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    for i in range(3):
        print(f"\n=== Run #{i + 1} ===")
        res = run_pipeline(
            spark, SPECS["orders_by_status"], df, out_dir, dedup_key="o_orderkey"
        )
        print(f"run_id={res.run_id} states={res.states}")
        print(f"drift={res.drift}")
        if i > 0:
            assert res.drift["previous_rows"] == res.row_counts["raw"], res.drift
            assert not res.drift["alert"]
    print("\n3 runs OK; drift state persisted across runs")


if __name__ == "__main__":
    main()
