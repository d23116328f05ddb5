"""Streaming differential fuzzer (tools/fuzz_streaming.py, judge ask
r10): generated stateless / grouped / time-window / stream-static
shapes run as batch AND as a one-file-per-trigger stream must agree
exactly. The CI slice keeps one seed small; larger sweeps run per
round (see CLAUDE.md round notes)."""

from __future__ import annotations

from tools.fuzz_streaming import StreamGenerator, run_fuzz_streaming

SF = "/root/testdata/sf0.001"


def test_fuzz_streaming_ci_slice(spark, tmp_path):
    failures = run_fuzz_streaming(
        spark, SF, n=15, seed=3, land_root=str(tmp_path / "land")
    )
    assert failures == []


def test_fuzz_streaming_grammar_covers_all_shapes(spark, tmp_path):
    """Every shape must actually be reachable from the generator (a
    weight typo could silently drop a family from coverage)."""
    gen = StreamGenerator(spark, SF, 5, str(tmp_path / "land2"))
    shapes = {gen.gen()["shape"] for _ in range(200)}
    assert shapes == {"stateless", "grouped", "dedup", "time_window",
                      "static_join"}
