"""Compare two bench outputs: like-for-like totals + per-query deltas.

Usage:
    python tools/compare_bench.py OLD.json NEW.json [rel_threshold] [abs_floor]

Accepts either a raw ``bench.py`` JSON line or the driver's
``BENCH_r{N}.json`` wrapper (``{"parsed": {...}}``). Remember the
standing rule: machine load varies 2× across minutes, so deltas from
two separate runs are SUGGESTIVE only — confirm any regression with a
within-run ``tools/profile_query.py`` A/B before acting on it.
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d["queries"]


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = _queries(sys.argv[1]), _queries(sys.argv[2])
    rel = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.2
    shared = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    if shared and t_old > 0:
        print(
            f"like-for-like ({len(shared)} queries): "
            f"{t_old:.1f}s -> {t_new:.1f}s ({t_new / t_old:.2f}x)"
        )
    else:
        print("no shared queries — nothing like-for-like to compare")
    for tag, names in (
        ("only-old", sorted(set(old) - set(new))),
        ("only-new", sorted(set(new) - set(old))),
    ):
        if names:
            print(f"{tag}: {', '.join(names)}")
    moved = [
        (q, old[q], new[q])
        for q in shared
        if abs(new[q] - old[q]) > max(rel * old[q], floor)
    ]
    for q, a, b in sorted(moved, key=lambda x: x[1] - x[2]):
        arrow = "REG" if b > a else "imp"
        print(f"{arrow} {q}: {a:.2f} -> {b:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
