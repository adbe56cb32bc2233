"""Physical-plan audit: assert the plans we designed for are the plans we
get — column pruning at the scan, filter pushdown, broadcast joins for dims,
whole-stage codegen around window stats. Run: python scripts/explain_audit.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from tods_spark.operators.rollup import rollup_raw  # noqa: E402
from tods_spark.queries import QUERIES  # noqa: E402
from tods_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
checks = []


def check(name: str, ok: bool, detail: str = "") -> None:
    checks.append((name, ok))
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")


def main() -> None:
    spark = get_spark(cores=8)

    # 1. column pruning: the rollup over the token table must NOT read tokens
    import tempfile

    from tods_spark.datagen import token_table

    with tempfile.TemporaryDirectory() as td:
        token_table(spark, 2000).write.parquet(f"{td}/tok")
        plan = rollup_raw(spark.read.parquet(f"{td}/tok"), "1m")._jdf.queryExecution().executedPlan().toString()
        scan = [line for line in plan.splitlines() if "ReadSchema" in line]
        pruned = scan and all("tokens" not in line for line in scan)
        check("rollup scan prunes tokens column", bool(pruned),
              scan[0].strip()[-120:] if scan else "no scan line")

    # 2. filter pushdown reaches the parquet scan
    q = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "error")
        .select("event_id")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    check("filter pushdown (PushedFilters)", "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]" in plan
          or "EqualTo(event_type,error)" in plan)

    # 3. denormalize join uses broadcast for dims
    plan = QUERIES["denormalize_revenue"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    check("denormalize uses BroadcastHashJoin", "BroadcastHashJoin" in plan)
    check("denormalize avoids cartesian", "CartesianProduct" not in plan)

    # 4. window stats stay in WholeStageCodegen / Tungsten WindowExec
    q = QUERIES["stat_mean_w5"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    check("stat window uses WindowExec", "Window" in plan)
    # under AQE, WholeStageCodegen nodes materialize per query stage at
    # runtime and don't print pre-execution — flip AQE off for the check
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        fmt = QUERIES["stat_mean_w5"](spark, SF)._jdf.queryExecution(
        ).executedPlan().toString()
        check("stat window has codegen spans", "*(" in fmt)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    check("stat window has no Python eval in hot path",
          "BatchEvalPython" not in plan)

    # 5. rollup agg is partial (map-side combine) — two HashAggregate stages
    plan = QUERIES["rollup_1m"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    check("rollup has partial+final HashAggregate",
          plan.count("HashAggregate") >= 2)

    # 6. AQE enabled
    check("AQE on", spark.conf.get("spark.sql.adaptive.enabled") == "true")

    bad = [n for n, ok in checks if not ok]
    print(f"\n{len(checks) - len(bad)}/{len(checks)} plan checks pass")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
