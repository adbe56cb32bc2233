"""Extra benchmarks for optimization work (guide §1.4): per-query noop-sink
isolation and .explain("formatted") capture. bench.py is FROZEN for
measurement; this file exists so optimization evidence (plan shapes, isolated
timings) can be produced without touching it.

Usage:
    python bench_extra.py [query ...]          # time queries, noop sink
    python bench_extra.py --explain [query..]  # dump plans to plans/r07/
    python bench_extra.py --suffix after ...   # plans/r07/<q>_after.txt

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tods_spark.queries import QUERIES  # noqa: E402
from tods_spark.session import get_spark  # noqa: E402

PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r07")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def get_impl(name):
    """Bench-name → callable: the two engine-native bench variants live in
    bench.py's BENCH_IMPLS; everything else is the registered query."""
    import bench as B
    return B._bench_fn(name)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    args = [a for a in args if a != "--explain"]
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="tods_spark_bench_extra", cores=cpus)

    if explain:
        os.makedirs(PLAN_DIR, exist_ok=True)
        for name in names:
            df = get_impl(name)(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"{name}: plan -> {path}")
        return

    for name in names:
        fn = get_impl(name)
        # one untimed warm run (JIT/Arrow workers), then best-of-reps
        spark.sparkContext.setJobDescription(f"warm:{name}")
        noop(fn(spark, sf_dir))
        best = None
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#{r}")
            t0 = time.time()
            noop(fn(spark, sf_dir))
            sec = time.time() - t0
            best = sec if best is None or sec < best else best
            print(f"  {name} run{r}: {sec:.3f}s")
        print(f"{name}: best {best:.3f}s (noop sink, {reps} reps)")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
