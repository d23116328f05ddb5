"""Time individual registry queries standalone (warm, noop-drained).

Usage: python tools/profile_query.py [query ...] [--sf DIR] [--n N]

Mirrors bench.py's methodology (warmup pass + best-of-N noop drains)
for an arbitrary subset, so a single query can be iterated on without
paying the full 38-query run.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobinsight_data_pipeline_v2_spark.plans import load_all
from jobinsight_data_pipeline_v2_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = 2
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--sf":
            sf_dir = argv[i + 1]
            args.remove(argv[i + 1]) if argv[i + 1] in args else None
        if a == "--n":
            n = int(argv[i + 1])
            args.remove(argv[i + 1]) if argv[i + 1] in args else None
    registry = load_all()
    names = args or list(registry)
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")

    def drain(df):
        df.write.format("noop").mode("overwrite").save()

    # serving-split entries (bench.SERVING_BENCH) are addressable too:
    # the index builds once outside the timer, the thunk is what's timed
    import importlib

    from bench import SERVING_BENCH

    for name in names:
        if name in SERVING_BENCH:
            mod_name, builder = SERVING_BENCH[name]
            mod = importlib.import_module(
                f"jobinsight_data_pipeline_v2_spark.plans.{mod_name}"
            )
            t0 = time.time()
            thunk = getattr(mod, builder)(spark, sf_dir)
            drain(thunk())
            build = time.time() - t0
            fn = lambda *_: thunk()  # noqa: E731
            suffix = f"  (index build {build:.3f}s untimed)"
        else:
            fn = registry[name][0]
            drain(fn(spark, sf_dir))  # warmup: codegen/JIT
            suffix = ""
        gc.collect()
        best = float("inf")
        for _ in range(n):
            gc.collect()
            t0 = time.time()
            drain(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.3f}s{suffix}")
    spark.stop()


if __name__ == "__main__":
    main()
