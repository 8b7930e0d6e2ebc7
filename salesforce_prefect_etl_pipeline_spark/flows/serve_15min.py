"""Cron-served deployment entry — the reference's
``deployments/serve_15min.py`` equivalent
(/root/reference/deployments/serve_15min.py:5-14:
``sf_etl_orchestrator.serve(cron="*/15 * * * *")``).

With Prefect installed, ``python -m
salesforce_prefect_etl_pipeline_spark.flows.serve_15min`` serves the
per-stage orchestrator flow on the same 15-minute cron. Without Prefect
(this container), ``--once`` runs a single local pipeline pass over a
parquet source so the deployment entry stays smoke-testable; the
periodic-batch cadence itself is also expressible as Structured
Streaming ``AvailableNow`` triggers (streaming/windows.py).
"""

from __future__ import annotations

import argparse

CRON = "*/15 * * * *"
DEPLOYMENT_NAME = "sf-etl-orchestrator-15min"


def run_once(source: str, out_dir: str, spec_name: str = "orders_by_status") -> dict:
    """One local pipeline pass (the flow body the deployment would serve)."""
    from salesforce_prefect_etl_pipeline_spark.flows.pipeline import run_pipeline
    from salesforce_prefect_etl_pipeline_spark.session import get_spark
    from salesforce_prefect_etl_pipeline_spark.specs import SPECS

    spark = get_spark("serve-once")
    df = spark.read.parquet(source)
    res = run_pipeline(spark, SPECS[spec_name], df, out_dir, dedup_key="o_orderkey")
    return {"run_id": res.run_id, "states": res.states, "artifacts": res.artifacts}


def serve() -> None:  # pragma: no cover - requires prefect
    """Reference posture: serve the orchestrator on a 15-min cron."""
    from salesforce_prefect_etl_pipeline_spark.flows.pipeline import (
        HAVE_PREFECT,
        build_prefect_flow,
    )

    if not HAVE_PREFECT:
        raise ImportError(
            "prefect is not installed; use --once for a single local run"
        )
    build_prefect_flow().serve(
        name=DEPLOYMENT_NAME,
        cron=CRON,
        tags=["orchestrator", "scheduled"],
    )


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--once", action="store_true", help="run one local pass and exit")
    p.add_argument("--source", default="/root/testdata/sf0.001/orders.parquet")
    p.add_argument("--out", default="out/serve_once")
    p.add_argument("--spec", default="orders_by_status")
    args = p.parse_args(argv)
    if args.once:
        print(run_once(args.source, args.out, args.spec))
    else:
        serve()


if __name__ == "__main__":
    main()
