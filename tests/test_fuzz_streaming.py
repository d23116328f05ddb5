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
    weight typo could silently drop a family from coverage), and the
    r12 stateful shapes must produce BOTH their on-time and
    late-injection variants."""
    gen = StreamGenerator(spark, SF, 5, str(tmp_path / "land2"))
    specs = [gen.gen() for _ in range(300)]
    shapes = {s["shape"] for s in specs}
    assert shapes == {"stateless", "grouped", "dedup", "time_window",
                      "static_join", "stream_stream", "dedup_watermark"}
    for shape in ("stream_stream", "dedup_watermark"):
        lates = {s["late"] for s in specs if s["shape"] == shape}
        assert lates == {True, False}, shape


def test_fuzz_streaming_stateful_shapes_ci_slice(spark, tmp_path):
    """r12 CI slice pinned to the two stateful shapes: seeded specs
    filtered to stream_stream / dedup_watermark (incl. late-injection
    variants) must all pass the batch==stream / contract-bounds
    check."""
    import tools.fuzz_streaming as fz

    gen_probe = StreamGenerator(spark, SF, 11, str(tmp_path / "probe"))
    # find a seed-11 prefix containing both shapes and a late variant
    specs = [gen_probe.gen() for _ in range(60)]
    wanted = [
        i
        for i, s in enumerate(specs)
        if s["shape"] in ("stream_stream", "dedup_watermark")
    ]
    assert len(wanted) >= 4
    assert any(specs[i]["late"] for i in wanted)

    class _Filtered(fz.StreamGenerator):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._n = 0

        def gen(self):
            while True:
                s = super().gen()
                if s["shape"] in ("stream_stream", "dedup_watermark"):
                    return s

    orig = fz.StreamGenerator
    fz.StreamGenerator = _Filtered
    try:
        failures = fz.run_fuzz_streaming(
            spark, SF, n=6, seed=11, land_root=str(tmp_path / "land3")
        )
    finally:
        fz.StreamGenerator = orig
    assert failures == []
