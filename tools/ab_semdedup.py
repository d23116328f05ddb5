"""Matched-session A/B of semdedup_groups' two edge scorers (r13).

Usage: python tools/ab_semdedup.py [SF_DIR] [N_ROUNDS]

Alternates fold / arrow drains of the full semantic_dedup gate in ONE
session (the variance rule: never compare across runs), warmup first,
and prints per-round and best-of times for each scorer. Also asserts
both paths produce the identical row multiset (the exactness proof's
empirical leg — the oracle pins it again at 3 SFs).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobinsight_data_pipeline_v2_spark.plans import load_all
from jobinsight_data_pipeline_v2_spark.plans import vectors as V
from jobinsight_data_pipeline_v2_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    gate = load_all()["semantic_dedup"][0]
    orig = V.semdedup_groups

    def build(scorer: str):
        V.semdedup_groups = functools.partial(orig, scorer=scorer)
        try:
            return gate(spark, sf_dir)
        finally:
            V.semdedup_groups = orig

    # equivalence check (once, cheap at any SF)
    a = {tuple(r) for r in build("fold").collect()}
    b = {tuple(r) for r in build("arrow").collect()}
    assert a == b, f"scorer mismatch: {len(a ^ b)} differing rows"
    print(f"equivalence: OK ({len(a)} rows identical)")

    times: dict[str, list[float]] = {"fold": [], "arrow": []}
    for r in range(rounds):
        for scorer in ("fold", "arrow") if r % 2 == 0 else ("arrow", "fold"):
            spark.sparkContext.setJobDescription(f"ab {scorer} r{r}")
            # bench methodology: CONSTRUCTION inside the timer — in
            # this Spark a "lazy" localCheckpoint finalizes its AQE
            # subtree (all shuffle stages run as jobs) at CALL time,
            # so building outside the timer hides most of the work
            t0 = time.time()
            df = build(scorer)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[scorer].append(dt)
            print(f"round {r} {scorer:5s} {dt:7.3f}s", flush=True)
    for k, v in times.items():
        print(f"{k:5s} best {min(v):.3f}s  all {[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
