"""Corpus-maintenance gates (plans/corpus.py): physical-plan shape +
semantic invariants that the DuckDB oracle alone doesn't pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.plans import load_all
from jobinsight_data_pipeline_v2_spark.plans.corpus import _NEW_SOURCES, _SEG_N
from jobinsight_data_pipeline_v2_spark.plans.text import _TOKENS
from jobinsight_data_pipeline_v2_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = load_all()[name][0](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_cross_dedup_broadcasts_batch_side(spark):
    """The incoming batch must broadcast; the reference corpus must
    never shuffle for the candidate join (the 100 TB contract)."""
    p = _plan(spark, "cross_dedup")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_quality_classifier_is_narrow(spark):
    """Inference is a single narrow scan: no hash exchange anywhere
    (the only exchange is the presentation sort's range partitioning).
    """
    p = _plan(spark, "quality_classifier")
    assert "Exchange hashpartitioning" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_segment_dedup_keeps_each_distinct_segment_once(spark):
    """Global invariant: total kept segments == corpus-wide distinct
    segment count (first-occurrence-wins keeps exactly one copy), and
    the lowest-doc_id document loses nothing to other docs (only to
    its own internal repeats)."""
    out = load_all()["segment_dedup"][0](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents")
    segs = docs.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, int(ceil(size({_TOKENS}) / {_SEG_N}.0))),"
                f" i -> concat_ws(' ', slice({_TOKENS}, (i - 1) * {_SEG_N} + 1,"
                f" {_SEG_N})))"
            )
        ).alias("seg")
    )
    n_distinct = segs.distinct().count()
    assert int(out["n_kept"].sum()) == n_distinct
    assert (out["n_kept"] <= out["n_segs"]).all()
    first = out.loc[out["doc_id"].idxmin()]
    own_distinct = (
        docs.filter(F.col("doc_id") == int(first["doc_id"]))
        .select(
            F.size(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, int(ceil(size({_TOKENS}) /"
                        f" {_SEG_N}.0))), i -> concat_ws(' ',"
                        f" slice({_TOKENS}, (i - 1) * {_SEG_N} + 1, {_SEG_N})))"
                    )
                )
            )
        )
        .first()[0]
    )
    assert int(first["n_kept"]) == own_distinct


def test_quality_classifier_gate_semantics(spark):
    out = load_all()["quality_classifier"][0](spark, SF).toPandas()
    assert ((out["logit"] > 0) == out["keep"]).all()
    keep_rate = out["keep"].mean()
    assert 0.1 < keep_rate < 0.9, "gate must split the corpus, not rubber-stamp"


def test_cross_dedup_emits_only_batch_docs(spark):
    out = load_all()["cross_dedup"][0](spark, SF)
    docs = load_table(spark, SF, "documents")
    joined = out.join(docs, out["new_doc"] == docs["doc_id"]).select("source")
    srcs = {r[0] for r in joined.collect()}
    assert srcs <= set(_NEW_SOURCES)
    ref_ids = {
        r[0]
        for r in docs.filter(~F.col("source").isin(*_NEW_SOURCES))
        .select("doc_id")
        .collect()
    }
    hits = {r[0] for r in out.select("first_ref_match").collect()}
    assert hits <= ref_ids
