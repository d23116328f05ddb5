"""Corpus-maintenance operators: segment-level dedup, incremental
cross-corpus dedup, and in-plan model-based quality filtering.

Net-new capability beyond the reference (training-data pipeline
surface). These are the three corpus-lifecycle operations the
document-level operators in ``plans/text.py`` don't cover:

- ``segment_dedup``: C4/RefinedWeb-style *line-level* exact dedup —
  remove every repeated text segment corpus-wide except its first
  occurrence, and reassemble each document from its surviving
  segments. Catches boilerplate (headers, navbars, license blurbs)
  that document-level dedup never sees.
- ``cross_dedup``: incremental dedup of an incoming batch against the
  existing corpus via MinHash band collision — the production shape
  of dedup (new crawl vs. reference corpus), where the two sides are
  wildly different sizes and the candidate join must broadcast the
  small side.
- ``quality_classifier``: linear-model quality gating (the fastText /
  logistic-classifier pass of a curation pipeline) with the entire
  inference step expressed in-plan — feature extraction and the
  weighted score are native columnar expressions, zero UDFs.

Oracle-compatibility choices (CLAUDE.md rules):
- Spark groups/joins on 64-bit xxhash64 keys while DuckDB groups the
  raw strings — equivalent absent 64-bit collisions, safe because the
  keys are grouping-only, never value-dependent selection (see
  ``text._shingle_key``).
- first-occurrence order rides one BIGINT ``doc_id * 1e6 + seg_idx``.
  The bound (segment index < 1e6 ⇔ docs under ~8M tokens) is enforced
  in-plan by an ``assert_true`` guard in ``segment_rows`` — a
  violating corpus fails the job loudly instead of silently
  mis-ordering winners (a general-purpose build would min a
  (doc_id, seg_idx) struct instead of the packed key).
- classifier weights are integers over integer count features — the
  logit is exact in both engines; no float hash hazard.
- SUM casts to BIGINT (DuckDB HUGEINT trap).

Scale design (100 TB):
- ``segment_dedup``: one shuffle on the segment hash (window-min, no
  orderBy → no per-group sort spec), one on doc_id to reassemble.
  Reassembly buffers are bounded by single-document size. A globally
  hot boilerplate segment concentrates its rows in one hash group —
  acceptable because the group does O(n) work (min), not O(n²).
- ``cross_dedup``: the incoming batch is small by construction; its
  band rows broadcast, the reference corpus streams through the join
  exactly once — never corpus×corpus. Signature construction is the
  zero-shuffle in-row build shared with ``minhash_lsh_candidates``.
- ``quality_classifier``: fully narrow single scan, whole-stage
  codegen end to end; the only exchange is the presentation sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table, spread
from . import presentation_sort, register
from .curation import _BLOOM_FP_BOUND, bloom_build, bloom_probe
from .text import (
    _dsir_class_case,
    _BAND_SIZE,
    _MINHASH_COEFFS,
    _MINHASH_P,
    _N_HASHES,
    _SHINGLE_N,
    _SHINGLE_RE,
    _SQL_BAND_KEYS,
    _SQL_SIG_COLS,
    _SQL_TOKENS,
    _STOP_SQL,
    _STOPWORDS,
    _TOKENS,
    _shingle_key,
)

# ---------------------------------------------------------------------------
# segment-level (line-level) exact dedup with document reassembly
# ---------------------------------------------------------------------------
#
# The corpus is single-space word soup with no newlines, so "lines"
# are fixed-width 8-token segments — the same first-occurrence-wins
# semantics as C4's line dedup, with segmentation swapped for the
# corpus's actual structure.

_SEG_N = 8


def segment_rows(toks: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, [carry…], seg_idx, seg, sk, ord) from (doc_id,
    t=token array): in-row {_SEG_N}-token segmentation, 64-bit segment
    hash, and the global first-occurrence order key. Checkpoint-free
    so the SAME transform runs on a streaming frame (streaming/
    curation.segment_dedup_stream); batch callers materialize ``toks``
    first (rule-10 projection-collapse guard). ``carry`` columns (e.g.
    an event-time column for the TTL-bounded streaming twin) ride
    through untouched."""
    return toks.select(
        "doc_id",
        *carry,
        F.posexplode(
            F.expr(
                f"""
                if(size(t) > 0,
                   transform(sequence(1, int(ceil(size(t) / {_SEG_N}.0))),
                             i -> concat_ws(' ',
                                      slice(t, (i - 1) * {_SEG_N} + 1,
                                            {_SEG_N}))),
                   cast(array() as array<string>))
                """
            )
        ).alias("seg_idx", "seg"),
    ).select(
        "doc_id",
        *carry,
        "seg_idx",
        "seg",
        _shingle_key("seg").alias("sk"),
        # Packed first-occurrence key. The seg_idx < 1e6 bound (docs
        # under ~8M tokens) is ENFORCED in-plan (ADVICE r4): a
        # violating corpus fails loudly via assert_true instead of
        # silently mis-ordering winners. assert_true returns NULL when
        # the predicate holds, so the coalesce(…, 0) add is a no-op on
        # every legal row; the streaming twin shares this guard.
        (
            F.col("doc_id") * 1_000_000
            + F.col("seg_idx")
            + F.coalesce(
                F.assert_true(
                    F.col("seg_idx") < 1_000_000,
                    F.lit(
                        "segment dedup: seg_idx >= 1e6 (document over "
                        "~8M tokens) overflows the packed "
                        "first-occurrence key; re-segment or widen ord"
                    ),
                ).cast("bigint"),
                F.lit(0),
            )
        ).alias("ord"),
    )


@register(
    "segment_dedup",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    segs AS (
        SELECT doc_id, i - 1 AS seg_idx,
               list_aggregate(t[(i - 1) * {_SEG_N} + 1 : i * {_SEG_N}],
                              'string_agg', ' ') AS seg
        FROM toks,
             UNNEST(generate_series(
                 1, CAST(ceil(len(t) / {_SEG_N}.0) AS BIGINT))) AS u(i)
    ),
    marked AS (
        SELECT doc_id, seg_idx, seg,
               CASE WHEN doc_id * 1000000 + seg_idx =
                         MIN(doc_id * 1000000 + seg_idx)
                             OVER (PARTITION BY seg)
                    THEN 1 ELSE 0 END AS is_first
        FROM segs
    )
    SELECT doc_id,
           COUNT(*) AS n_segs,
           CAST(SUM(is_first) AS BIGINT) AS n_kept,
           string_agg(CASE WHEN is_first = 1 THEN seg END,
                      ' ' ORDER BY seg_idx) AS clean_text
    FROM marked
    GROUP BY 1
    ORDER BY 1
    """,
)
def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide segment (line) dedup: keep each distinct {_SEG_N}-token
    segment's FIRST occurrence (ordered by doc_id, position), drop all
    later copies, and reassemble documents from surviving segments.

    Plan: in-row segmentation (transform over a token-index sequence,
    guarded against Spark's descending ``sequence(1, 0)``) → one
    window-min shuffle on the 64-bit segment hash (partitionBy only —
    no ordering spec, so no per-group sort requirement beyond
    clustering) → one groupBy(doc_id) to count and reassemble. The
    reassembly buffer is one document's own segments — bounded by doc
    size, never by corpus size.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    # Materialize the token arrays before the segment build: the
    # transform lambda references `t` once per segment index, and
    # projection collapse would otherwise inline the split() into
    # every reference (CLAUDE.md rule 10's O(n²) trap).
    toks = docs.select("doc_id", F.expr(_TOKENS).alias("t")).localCheckpoint(
        eager=False
    )
    segs = segment_rows(toks)
    marked = segs.withColumn(
        "is_first",
        (F.col("ord") == F.min("ord").over(Window.partitionBy("sk"))).cast(
            "int"
        ),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum("is_first").alias("n_kept"),
            # collect_list drops the NULLs the if() plants on dropped
            # segments; struct sort restores document order; nullif
            # matches DuckDB's NULL string_agg over zero kept rows.
            F.expr(
                "nullif(concat_ws(' ', transform(array_sort("
                "collect_list(if(is_first = 1, struct(seg_idx, seg), null))"
                "), s -> s.seg)), '')"
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# incremental cross-corpus dedup (new batch vs. reference corpus)
# ---------------------------------------------------------------------------

# Deterministic batch split on the source column: two sources play the
# incoming crawl, the rest are the standing corpus.
_NEW_SOURCES = ("src0", "src1")
_NEW_SQL = "(" + ", ".join(f"'{s}'" for s in _NEW_SOURCES) + ")"
_N_BANDS = _N_HASHES // _BAND_SIZE


def _band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) MinHash band rows, zero-shuffle build.

    Same construction as ``minhash_lsh_candidates`` (one md5 per
    shingle, {_N_HASHES} affine remixes, {_N_BANDS} band keys) so the
    two gates stay oracle-consistent; kept separate so each caller
    controls its own materialization (the self-join gate checkpoints,
    this one broadcasts a single-consumer side instead).
    """
    hs = docs.select(
        "doc_id",
        F.transform(
            F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1)),
            lambda sh: F.conv(
                F.substring(F.md5(sh.cast("binary")), 1, 8), 16, 10
            ).cast("long"),
        ).alias("hs"),
    ).filter(F.size("hs") > 0)
    sigs = hs.select(
        "doc_id",
        *[
            F.expr(
                f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {_MINHASH_P}L))"
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(_MINHASH_COEFFS)
        ],
    )
    band_key_exprs = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"m{band * _BAND_SIZE + j}").cast("string")
                    for j in range(_BAND_SIZE)
                ],
            ).cast("binary")
        ).alias(f"bk{band}")
        for band in range(_N_BANDS)
    ]
    return (
        sigs.select("doc_id", *band_key_exprs)
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            F.col(f"bk{band}").alias("band_key"),
                        )
                        for band in range(_N_BANDS)
                    ]
                )
            ).alias("bb"),
        )
        .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"))
    )


def _sql_band_ctes(name: str, pred: str) -> str:
    """DuckDB CTE chain mirroring ``_band_rows`` over a filtered slice."""
    return f"""
    {name}_toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents WHERE {pred}
    ),
    {name}_shingles AS (
        SELECT DISTINCT doc_id,
               list_aggregate(tokens[i : i + {_SHINGLE_N} - 1],
                              'string_agg', ' ') AS shingle
        FROM {name}_toks,
             UNNEST(generate_series(1, len(tokens) - {_SHINGLE_N} + 1)) AS t(i)
    ),
    {name}_hashed AS (
        SELECT doc_id, ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h
        FROM {name}_shingles
    ),
    {name}_sigs AS (
        SELECT doc_id,
               {_SQL_SIG_COLS}
        FROM {name}_hashed
        GROUP BY 1
    ),
    {name}_bands AS (
        SELECT doc_id, band,
               CASE band
                    {_SQL_BAND_KEYS}
               END AS band_key
        FROM {name}_sigs,
             UNNEST(generate_series(0, {_N_BANDS - 1})) AS t(band)
    )"""


@register(
    "cross_dedup",
    f"""
    WITH {_sql_band_ctes("new", f"source IN {_NEW_SQL}")},
    {_sql_band_ctes("ref", f"source NOT IN {_NEW_SQL}")}
    SELECT n.doc_id AS new_doc,
           COUNT(DISTINCT r.doc_id) AS n_ref_matches,
           MIN(r.doc_id) AS first_ref_match
    FROM new_bands n
    JOIN ref_bands r
      ON n.band = r.band AND n.band_key = r.band_key
    GROUP BY 1
    ORDER BY 1
    """,
)
def cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: which docs of the incoming batch (source ∈
    {_NEW_SOURCES}) MinHash-band-collide with the standing corpus, and
    against how many reference docs.

    The production dedup shape: a daily crawl is orders of magnitude
    smaller than the corpus it must be checked against, so the batch's
    band rows BROADCAST and the corpus streams through the join once
    — no corpus shuffle, no corpus×corpus pairing, cost linear in
    corpus size per batch. Both sides reuse the zero-shuffle in-row
    signature build; the source filters push down to the parquet scan.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    new_bands = _band_rows(docs.filter(F.col("source").isin(*_NEW_SOURCES)))
    ref_bands = _band_rows(docs.filter(~F.col("source").isin(*_NEW_SOURCES)))
    n = F.broadcast(new_bands).alias("n")
    r = ref_bands.alias("r")
    return (
        n.join(
            r,
            (F.col("n.band") == F.col("r.band"))
            & (F.col("n.band_key") == F.col("r.band_key")),
        )
        .groupBy(F.col("n.doc_id").alias("new_doc"))
        .agg(
            F.countDistinct("r.doc_id").alias("n_ref_matches"),
            F.min("r.doc_id").alias("first_ref_match"),
        )
        .orderBy("new_doc")
    )


# ---------------------------------------------------------------------------
# model-based quality filtering (linear classifier, in-plan inference)
# ---------------------------------------------------------------------------
#
# The fastText-style quality-classifier pass of a curation pipeline,
# with the model small enough to inline: integer weights over integer
# count features, logit computed as a native columnar expression.
# Weights are fixed literals standing in for a trained model (committed,
# no runtime RNG); the point is the INFERENCE SHAPE — feature extraction
# and scoring fused into one narrow codegen'd scan, the way a real
# coefficient vector would be broadcast and applied at 100 TB.

_W_DISTINCT = 4
_W_STOP = 2
_W_TOK = -2
_W_SHORT = -3


def classifier_score(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, [carry…], counts…, logit, keep) — the entire inference
    as one narrow projection over (doc_id, text). Shared verbatim by
    the batch gate and the streaming twins (streaming/curation.
    classifier_stream, curation_stream): stateless, so the same plan
    runs incrementally with zero state store. ``carry`` columns ride
    through untouched."""
    stop_arr = ", ".join(f"'{w}'" for w in _STOPWORDS)
    f = docs.withColumn("t", F.expr(_TOKENS)).select(
        "doc_id",
        *carry,
        F.size("t").alias("n_tok"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        F.size(F.expr(f"filter(t, x -> x IN ({stop_arr}))")).alias("n_stop"),
        F.size(F.expr("filter(t, x -> length(x) <= 2)")).alias("n_short"),
    )
    logit = (
        F.lit(_W_DISTINCT) * F.col("n_distinct")
        + F.lit(_W_STOP) * F.col("n_stop")
        + F.lit(_W_TOK) * F.col("n_tok")
        + F.lit(_W_SHORT) * F.col("n_short")
    )
    return f.filter(F.col("n_tok") > 0).select(
        "doc_id",
        *carry,
        "n_tok",
        "n_distinct",
        "n_stop",
        "n_short",
        logit.cast("long").alias("logit"),
        (logit > 0).alias("keep"),
    )


@register(
    "quality_classifier",
    f"""
    WITH f AS (
        SELECT doc_id,
               len({_SQL_TOKENS}) AS n_tok,
               len(list_distinct({_SQL_TOKENS})) AS n_distinct,
               len(list_filter({_SQL_TOKENS}, x -> x IN {_STOP_SQL}))
                   AS n_stop,
               len(list_filter({_SQL_TOKENS}, x -> length(x) <= 2))
                   AS n_short
        FROM documents
    )
    SELECT doc_id, n_tok, n_distinct, n_stop, n_short,
           {_W_DISTINCT} * n_distinct + {_W_STOP} * n_stop
               + {_W_TOK} * n_tok + {_W_SHORT} * n_short AS logit,
           ({_W_DISTINCT} * n_distinct + {_W_STOP} * n_stop
               + {_W_TOK} * n_tok + {_W_SHORT} * n_short) > 0 AS keep
    FROM f
    WHERE n_tok > 0
    ORDER BY doc_id
    """,
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over per-doc count features, inference
    fully in-plan (zero UDFs, zero shuffles before the output sort).

    logit = {_W_DISTINCT}·n_distinct + {_W_STOP}·n_stop
    {_W_TOK}·n_tok {_W_SHORT}·n_short; keep ⇔ logit > 0 (≈44% of this
    corpus). Integer weights × integer counts keep the score exact in
    both engines; a float-weight model would quantize its coefficients
    the same way (operators/skew.py's DECIMAL discipline).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    # boundary below the presentation sort (r12 opt — see
    # plans.presentation_sort; the range sampling pass otherwise runs
    # the narrow scoring pipeline twice)
    return presentation_sort(classifier_score(docs), "doc_id")


# ---------------------------------------------------------------------------
# JSONL ingest round trip (oracle gate for the S15 source path)
# ---------------------------------------------------------------------------
#
# The only engine components with no oracle coverage in round 5 were
# the file-format sources (judge ask #3): golden unit tests exercised
# them, but nothing in queries() read through a non-parquet ingest
# path end to end. This gate materializes the documents table as JSONL
# (Spark's json writer: one object per line, nulls omitted), injects a
# deterministic set of garbage lines, reads it back through
# sources.jsonl_source.read_jsonl_docs, and aggregates BOTH output
# frames. The oracle computes the same aggregates from the pristine
# parquet view plus the injection constants — so any corruption,
# drop, duplication, or mis-quarantine introduced by the write→read
# round trip diverges from the oracle and fails the value hash. (The
# oracle deliberately does not re-parse the files: DuckDB never sees
# them, which keeps the gate independent of driver run ordering; what
# is pinned is exactly the round-trip-preserves-the-table contract,
# plus quarantine = the injected garbage and nothing else — testdata
# documents carry no null doc_id/text at any SF, asserted in-plan by
# the lang bucket totals.)

_JSONL_MALFORMED = (
    '{"doc_id": 900000000, "text": "truncated...',
    "this line is not JSON at all",
)
_JSONL_MISSING_ID = '{"text": "injected orphan segment, no doc_id"}'
_JSONL_MISSING_TEXT = '{"doc_id": 900000001, "lang": "vi"}'


_GATE_DIRS_CREATED: set[str] = set()


def _sweep_stale_gate_dirs(prefix: str = "/tmp/jobinsight_") -> None:
    """Remove gate dirs left by DEAD processes: pid-keyed names stop
    two live drivers racing (ADVICE r6), but each crashed/killed run
    would otherwise leak a full corpus export into /tmp (review r7).
    A dir is reclaimed only when its embedded pid no longer exists —
    never by age, so a slow live grader is untouchable."""
    import glob
    import os
    import shutil

    for d in glob.glob(prefix + "*_gate_*_[0-9]*"):
        pid_part = d.rsplit("_", 1)[-1]
        if not pid_part.isdigit() or int(pid_part) == os.getpid():
            continue
        try:
            os.kill(int(pid_part), 0)
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another user: leave it


def _cleanup_own_gate_dirs() -> None:
    import shutil

    for d in _GATE_DIRS_CREATED:
        shutil.rmtree(d, ignore_errors=True)


def _jsonl_gate_dir(sf_dir: str) -> str:
    import atexit
    import hashlib
    import os

    # Keyed by sf_dir AND pid: two concurrent drivers grading the same
    # sf_dir must not race on overwrite/rmtree of a shared gate dir
    # (ADVICE r6). The pid keying must not trade the race for a /tmp
    # leak (review r7): this process's dirs are removed at exit, and
    # dirs whose owning pid is dead are swept opportunistically.
    _sweep_stale_gate_dirs()
    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    d = f"/tmp/jobinsight_jsonl_gate_{h}_{os.getpid()}"
    if not _GATE_DIRS_CREATED:
        atexit.register(_cleanup_own_gate_dirs)
    # ONE shared variant tuple so a new source gate cannot be missed
    # by the atexit cleanup (ADVICE r10: mbox leaked a full corpus
    # export per run because its variant was registered nowhere).
    for variant in _GATE_DIR_VARIANTS:
        _GATE_DIRS_CREATED.add(d.replace("jsonl", variant))
    return d


_GATE_DIR_VARIANTS = (
    "jsonl",  # identity — d itself
    "warc",
    "csv",
    "orc",
    "schev",
    "xml",
    "avro",
    "fwf",
    "mbox",
    "archive",
    "tfrecord",
    "txlog",
)


@register(
    "jsonl_roundtrip",
    """
    SELECT 'lang:' || COALESCE(lang, '<null>') AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY lang
    UNION ALL
    SELECT 'quarantine:malformed_json', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:doc_id', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:text', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
    ORDER BY bucket
    """,
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → JSONL files → ``read_jsonl_docs`` → aggregates, with
    injected garbage lines that must land in quarantine — the S15
    source path pinned end to end against the pristine parquet table.

    The write happens eagerly (driver-side small corpus export +
    4 injected lines appended as one extra file); the returned frame
    is lazy over the written files: per-lang doc counts + total chars
    from the round-tripped rows, unioned with per-reason quarantine
    counts. Both sides of the union are narrow aggregations of ONE
    splittable text scan (see sources/jsonl_source.py).
    """
    import os

    from ..sources.jsonl_source import read_jsonl_docs

    out = _jsonl_gate_dir(sf_dir)
    docs_src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    docs_src.write.mode("overwrite").json(out)
    with open(os.path.join(out, "zz_injected.jsonl"), "w") as f:
        for line in (
            *_JSONL_MALFORMED,
            _JSONL_MISSING_ID,
            _JSONL_MISSING_TEXT,
        ):
            f.write(line + "\n")
    docs, quar = read_jsonl_docs(spark, out)
    by_lang = docs.groupBy(
        F.concat(F.lit("lang:"), F.coalesce("lang", F.lit("<null>"))).alias(
            "bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
    )
    by_reason = (
        quar.groupBy(
            F.concat(F.lit("quarantine:"), F.col("reason")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bucket", "n", F.lit(0).cast("long").alias("chars"))
    )
    return by_lang.unionByName(by_reason).orderBy("bucket")


_CSV_MALFORMED = (
    "abc,type-failed doc id,en,src1,11",  # doc_id fails bigint
    "too,few",  # token count under the schema
)
_CSV_MISSING_ID = ",orphan text with no id,en,src2,22"
_CSV_MISSING_TEXT = "900000001,,vi,src3,0"  # empty field reads as NULL


@register(
    "csv_roundtrip",
    """
    SELECT 'lang:' || COALESCE(lang, '<null>') AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(len(text)) AS BIGINT) AS tchars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY lang
    UNION ALL
    SELECT 'quarantine:malformed_csv', CAST(2 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:doc_id', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:text', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    ORDER BY bucket
    """,
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → headerless CSV files → ``read_csv_docs`` →
    aggregates, with injected garbage lines that must land in
    quarantine (one type failure, one short line, one empty required
    id, one empty required text) — the CSV source path pinned end to
    end against the pristine parquet table (the ``jsonl_roundtrip``
    oracle device: DuckDB never reads the exported files, so the gate
    is independent of driver run ordering; pinned is exactly the
    round-trip-preserves-the-table contract plus quarantine = the
    injected garbage and nothing else). Beyond the JSONL gate's
    counters this one also sums round-tripped TEXT lengths and doc
    ids per lang bucket, so quote/escape corruption or row identity
    swaps fail the hash even though n_chars rides along unchanged.
    """
    import os

    from ..sources.csv_source import read_csv_docs

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "csv")
    docs_src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    docs_src.write.mode("overwrite").csv(out)
    with open(os.path.join(out, "zz_injected.csv"), "w") as f:
        for line in (
            *_CSV_MALFORMED,
            _CSV_MISSING_ID,
            _CSV_MISSING_TEXT,
        ):
            f.write(line + "\n")
    docs, quar = read_csv_docs(spark, out)
    by_lang = docs.groupBy(
        F.concat(F.lit("lang:"), F.coalesce("lang", F.lit("<null>"))).alias(
            "bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.length("text")).alias("tchars"),
        F.sum("doc_id").alias("id_sum"),
    )
    by_reason = (
        quar.groupBy(
            F.concat(F.lit("quarantine:"), F.col("reason")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            "n",
            F.lit(0).cast("long").alias("chars"),
            F.lit(0).cast("long").alias("tchars"),
            F.lit(0).cast("long").alias("id_sum"),
        )
    )
    return by_lang.unionByName(by_reason).orderBy("bucket")


# late-batch injection constants for the ORC gate: one good doc in a
# NEW partition (discovery must pick the directory up), plus one row
# per required-field violation that must land in row-level quarantine
_ORC_EXTRA_GOOD = (900000001, "orc extra doc", "zz", "late_batch", 13)
_ORC_MISSING_TEXT = (900000002, None, "en", "late_batch", 0)
_ORC_MISSING_ID = (None, "orphan orc row", "en", "late_batch", 14)


@register(
    "orc_roundtrip",
    """
    SELECT 'lang:' || lang AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(len(text)) AS BIGINT) AS tchars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY lang
    UNION ALL
    SELECT 'lang:zz', CAST(1 AS BIGINT), CAST(13 AS BIGINT),
           CAST(900000001 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:doc_id', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:text', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    ORDER BY bucket
    """,
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → partitioned ORC export → late append batch →
    ``read_orc_docs`` → aggregates: the S17 columnar interchange
    source pinned end to end against the pristine parquet table (the
    ``jsonl_roundtrip`` oracle device — DuckDB never reads the
    exported files, so the gate is independent of driver run
    ordering).

    What is pinned: (a) the partitioned write/read round trip
    preserves every row — per-lang counts, TEXT lengths and doc-id
    sums all reappear exactly; (b) partition discovery picks up the
    appended late batch's NEW ``lang=zz`` directory; (c) the
    row-level quarantine contract — ORC has no malformed-line path,
    so required-field NULLs (one per field) must land in quarantine
    with their reason and nothing else may. Both sides of the union
    are narrow aggregations of ONE columnar scan.
    """
    from ..sources.orc_source import read_orc_docs, write_orc_corpus

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "orc")
    docs_src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    write_orc_corpus(docs_src, out)
    late = spark.createDataFrame(
        [_ORC_EXTRA_GOOD, _ORC_MISSING_TEXT, _ORC_MISSING_ID],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    write_orc_corpus(late, out, mode="append")
    docs, quar = read_orc_docs(spark, out)
    by_lang = docs.groupBy(
        F.concat(F.lit("lang:"), F.col("lang")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("tchars"),
        F.sum("doc_id").alias("id_sum"),
    )
    by_reason = (
        quar.groupBy(
            F.concat(F.lit("quarantine:"), F.col("reason")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            "n",
            F.lit(0).cast("long").alias("tchars"),
            F.lit(0).cast("long").alias("id_sum"),
        )
    )
    return by_lang.unionByName(by_reason).orderBy("bucket")


# Avro gate injection constants: two good lang=zz docs bracketing a
# hand-built corrupt block (the one AFTER it proves sync-marker
# resync recovers the file tail), two required-field-null rows for the
# row-level quarantine path, and one junk container.
_AVRO_GOOD_A = {"doc_id": 900000101, "text": "avro doc before bad block",
                "lang": "zz", "source": "inj", "n_chars": 25}
_AVRO_GOOD_B = {"doc_id": 900000102, "text": "avro doc after bad block",
                "lang": "zz", "source": "inj", "n_chars": 24}
_AVRO_MISSING_TEXT = {"doc_id": 900000103, "text": None, "lang": "en",
                      "source": "inj", "n_chars": 0}
_AVRO_MISSING_ID = {"doc_id": None, "text": "orphan avro row",
                    "lang": "en", "source": "inj", "n_chars": 15}


@register(
    "avro_roundtrip",
    """
    SELECT 'lang:' || lang AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(len(text)) AS BIGINT) AS tchars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY lang
    UNION ALL
    SELECT 'lang:zz', CAST(2 AS BIGINT), CAST(49 AS BIGINT),
           CAST(1800000203 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:bad_container:ValueError', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:corrupt_block', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:doc_id', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:text', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    ORDER BY bucket
    """,
)
def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → distributed Avro container export (half the files
    deflate-coded) → injected damage → ``read_avro_docs`` →
    aggregates: the S19 Kafka-ecosystem interchange source pinned end
    to end against the pristine parquet table (the ``jsonl_roundtrip``
    oracle device — DuckDB never reads the exported files).

    What is pinned beyond the write/read round trip preserving every
    row (per-lang counts, text lengths, id sums): (a) BLOCK-level
    quarantine with sync-marker RESYNC — the injected file carries a
    good block, a hand-built undecodable block, then another good
    block, and both good rows must reappear while exactly one
    corrupt_block row quarantines (losing the tail would drop the
    second zz doc and break the lang:zz sums); (b) an unreadable
    container (bad magic) quarantines once as bad_container;
    (c) required-field NULLs land row-level as missing:<field>.
    Both output frames are projections of ONE binaryFile scan +
    one Arrow-batched decode (sources/avro_source.py).
    """
    import os

    from ..sources.avro_source import (
        DOC_AVRO_SCHEMA,
        _enc_long,
        _enc_record,
        encode_avro_container,
        read_avro_docs,
        write_avro_archive,
    )

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "avro")
    docs_src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    write_avro_archive(docs_src.repartition(8), out).collect()

    # injected container: good block / undecodable block / good block /
    # required-null block — hand-framed around a fixed sync marker
    sync = b"avro-gate-sync!!"
    head = encode_avro_container(
        [_AVRO_GOOD_A], DOC_AVRO_SCHEMA, "null", sync=sync
    )
    bad_block = _enc_long(1) + _enc_long(5) + b"\xff" * 5 + sync
    enc_b = _enc_record(DOC_AVRO_SCHEMA, _AVRO_GOOD_B)
    block_b = _enc_long(1) + _enc_long(len(enc_b)) + enc_b + sync
    enc_m = _enc_record(DOC_AVRO_SCHEMA, _AVRO_MISSING_TEXT) + _enc_record(
        DOC_AVRO_SCHEMA, _AVRO_MISSING_ID
    )
    block_m = _enc_long(2) + _enc_long(len(enc_m)) + enc_m + sync
    with open(os.path.join(out, "zz_injected.avro"), "wb") as f:
        f.write(head + bad_block + block_b + block_m)
    with open(os.path.join(out, "zz_junk.avro"), "wb") as f:
        f.write(b"JUNK not an avro container at all")

    docs, quar = read_avro_docs(spark, out)
    by_lang = docs.groupBy(
        F.concat(F.lit("lang:"), F.col("lang")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("tchars"),
        F.sum("doc_id").alias("id_sum"),
    )
    by_reason = (
        quar.groupBy(
            F.concat(F.lit("quarantine:"), F.col("reason")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            "n",
            F.lit(0).cast("long").alias("tchars"),
            F.lit(0).cast("long").alias("id_sum"),
        )
    )
    return by_lang.unionByName(by_reason).orderBy("bucket")


_TFREC_GOOD_A = {"doc_id": 910000101, "text": "tfrecord doc before damage",
                 "lang": "zz", "source": "inj", "n_chars": 26}
_TFREC_GOOD_B = {"doc_id": 910000102, "text": "tfrecord doc after damage",
                 "lang": "zz", "source": "inj", "n_chars": 25}
# written AFTER the framing_lost frame — must NOT reappear (no sync
# marker to resync on; the tail loss is the format's pinned contract)
_TFREC_LOST_TAIL = {"doc_id": 910000104, "text": "unreachable tail doc",
                    "lang": "zz", "source": "inj", "n_chars": 20}
_TFREC_MISSING_TEXT = {"doc_id": 910000103, "text": None, "lang": "en",
                       "source": "inj", "n_chars": 0}
_TFREC_MISSING_ID = {"doc_id": None, "text": "orphan tfrecord row",
                     "lang": "en", "source": "inj", "n_chars": 19}


@register(
    "tfrecord_roundtrip",
    """
    SELECT 'lang:' || lang AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(len(text)) AS BIGINT) AS tchars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY lang
    UNION ALL
    SELECT 'lang:zz', CAST(2 AS BIGINT), CAST(51 AS BIGINT),
           CAST(1820000203 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:bad_payload_crc', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:bad_proto', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:framing_lost', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:doc_id', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:text', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:truncated', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    ORDER BY bucket
    """,
)
def tfrecord_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → distributed TFRecord export → injected damage →
    ``read_tfrecord_docs`` → aggregates: the S23 training-data
    container (length-prefixed masked-CRC32C frames, tf.train.Example
    protobuf payloads) pinned end to end against the pristine parquet
    table (the ``jsonl_roundtrip`` oracle device — DuckDB never reads
    the exported files).

    What is pinned beyond the write/read round trip preserving every
    row (per-lang counts, text lengths, id sums): (a) PAYLOAD-level
    damage costs exactly one record — a flipped payload byte
    (bad_payload_crc), a CRC-valid non-Example payload (bad_proto),
    and required-feature absences (missing:<field>) each quarantine
    one row while the frames AFTER them still decode (the zz doc B
    sums prove it); (b) LENGTH-CRC damage loses the file TAIL — one
    framing_lost row quarantines and the good zz doc framed after it
    must NOT reappear (lang:zz pins exactly A+B), the deliberate
    contrast with Avro's sync-marker resync; (c) EOF mid-record
    quarantines as truncated. Both output frames are projections of
    ONE binaryFile scan + one Arrow-batched decode
    (sources/tfrecord_source.py).
    """
    import os

    from ..sources.tfrecord_source import (
        encode_example,
        frame_record,
        read_tfrecord_docs,
        write_tfrecord_archive,
    )

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "tfrecord")
    docs_src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    write_tfrecord_archive(docs_src.repartition(8), out).collect()

    # injected file: good A / payload-flipped / good B / CRC-valid
    # garbage proto / missing:text / missing:doc_id / length-CRC
    # flipped / good tail that must stay unreachable
    damaged = bytearray(
        frame_record(
            encode_example(
                {"doc_id": 910000900, "text": "to be damaged",
                 "lang": "zz", "source": "inj", "n_chars": 13}
            )
        )
    )
    damaged[12] ^= 0xFF  # first payload byte; its CRC no longer matches
    lost = bytearray(frame_record(encode_example(_TFREC_LOST_TAIL)))
    lost[8] ^= 0xFF  # length-CRC byte: framing trust gone from here on
    injected = (
        frame_record(encode_example(_TFREC_GOOD_A))
        + bytes(damaged)
        + frame_record(encode_example(_TFREC_GOOD_B))
        + frame_record(b"\x00\x01\x02")  # CRCs valid, not an Example
        + frame_record(encode_example(_TFREC_MISSING_TEXT))
        + frame_record(encode_example(_TFREC_MISSING_ID))
        + bytes(lost)
        + frame_record(encode_example(_TFREC_LOST_TAIL))
    )
    with open(os.path.join(out, "zz_injected.tfrecord"), "wb") as f:
        f.write(injected)
    # EOF mid-payload: header + length CRC intact, body cut short
    whole = frame_record(
        encode_example(
            {"doc_id": 910000901, "text": "cut off mid payload",
             "lang": "zz", "source": "inj", "n_chars": 19}
        )
    )
    with open(os.path.join(out, "zz_trunc.tfrecord"), "wb") as f:
        f.write(whole[:20])

    docs, quar = read_tfrecord_docs(spark, out)
    by_lang = docs.groupBy(
        F.concat(F.lit("lang:"), F.col("lang")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("tchars"),
        F.sum("doc_id").alias("id_sum"),
    )
    by_reason = (
        quar.groupBy(
            F.concat(F.lit("quarantine:"), F.col("reason")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            "n",
            F.lit(0).cast("long").alias("tchars"),
            F.lit(0).cast("long").alias("id_sum"),
        )
    )
    return by_lang.unionByName(by_reason).orderBy("bucket")


@register(
    "warc_roundtrip",
    """
    SELECT doc_id % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(length(text)) AS BIGINT) AS chars
    FROM documents GROUP BY 1 ORDER BY 1
    """,
)
def warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → distributed WARC export → ``read_warc_records`` →
    aggregates: the S14 archive source pinned end to end against the
    pristine parquet table (companion to ``jsonl_roundtrip``, same
    oracle device — DuckDB never reads the files, so the gate is
    independent of driver run ordering; what is pinned is that the
    WARC write/split/gzip/HTTP-strip round trip preserves every
    record exactly).

    The export runs DISTRIBUTED (``write_warc_archive``: one task =
    one archive file, half of them per-member-gzipped so both decode
    paths execute); the read-back parses doc ids out of the record
    URIs and decodes payload bytes to text. Buckets by doc_id % 10:
    a dropped, duplicated, or corrupted record moves n_docs / id_sum /
    chars of its bucket. The gate-scale repartition(8) just spreads
    the corpus over several archives; a production export would keep
    the source partitioning.
    """
    import os
    import shutil

    from ..sources.warc_source import read_warc_records, write_warc_archive

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "warc")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    recs = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("target_uri"),
        F.col("text").alias("payload"),
    ).repartition(8)
    write_warc_archive(recs, out).count()  # drain: executes the export
    back = read_warc_records(spark, f"{out}/*")
    parsed = back.select(
        F.expr("cast(substring(target_uri, 9) as bigint)").alias("doc_id"),
        F.col("payload").cast("string").alias("text"),
    )
    return (
        parsed.groupBy((F.col("doc_id") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.sum(F.length("text")).alias("chars"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# bigram LM coverage scoring (the n-gram language-model quality signal)
# ---------------------------------------------------------------------------
#
# The classic LM-based quality filter scores documents by how typical
# their n-gram stream is of the corpus (KenLM-style perplexity in
# production curation). A log-probability perplexity would ulp-diverge
# between engines, so the gate pins the integer-exact core of the same
# signal: build the corpus's top-V bigram vocabulary, score each doc
# by the fraction of its bigram OCCURRENCES covered by that
# vocabulary, division last (the embedding-quantization float
# discipline). Gibberish and boilerplate-free natural text separate on
# exactly this statistic.

_BIGRAM_TOP_V = 500
_SQL_BIGRAMS = (
    "list_transform(generate_series(1, len(t) - 1), "
    "i -> t[i] || ' ' || t[i + 1])"
)


def bigram_vocab(bigrams: DataFrame, top_v: int = _BIGRAM_TOP_V) -> DataFrame:
    """(bg,) — the ``top_v`` most frequent bigrams of a (…, bg)
    occurrence stream, ties broken lexicographically (a total order,
    rule 3). One map-side-combined count on the bigram key, then
    TakeOrdered — vocabulary-sized, broadcastable by construction."""
    return (
        bigrams.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bg")
        .limit(top_v)
        .select("bg")
    )


@register(
    "bigram_coverage",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    bigrams AS (
        SELECT doc_id, unnest({_SQL_BIGRAMS}) AS bg FROM toks
    ),
    vocab AS (
        SELECT bg FROM (
            SELECT bg, COUNT(*) AS n FROM bigrams GROUP BY bg
            ORDER BY n DESC, bg LIMIT {_BIGRAM_TOP_V}
        )
    ),
    per_doc AS (
        SELECT b.doc_id,
               COUNT(*) AS n_bi,
               CAST(SUM(CASE WHEN v.bg IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cov
        FROM bigrams b LEFT JOIN vocab v USING (bg)
        GROUP BY b.doc_id
    )
    SELECT doc_id, CAST(n_bi AS BIGINT) AS n_bi, n_cov,
           CAST(n_cov AS DOUBLE) / n_bi AS coverage
    FROM per_doc
    ORDER BY doc_id
    """,
)
def bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram-LM coverage: the fraction of the doc's bigram
    occurrences that fall inside the corpus's top-{_BIGRAM_TOP_V}
    bigram vocabulary — the integer-exact core of an n-gram LM quality
    filter (coverage is monotone in the truncated-LM probability mass
    the doc draws from).

    Scale shape: bigram construction is in-row (narrow transform);
    the vocabulary is ONE map-side-combined count + TakeOrdered
    (vocabulary-sized, broadcast); per-doc scoring is a broadcast
    LEFT join of the doc's bigram stream against the vocab plus one
    groupBy(doc) with map-side partials. Docs with fewer than two
    tokens carry no bigrams and drop out on both sides. The gate's
    only float is the final division of two exact integers.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    return coverage_counts(docs).select(
        "doc_id",
        "n_bi",
        "n_cov",
        (F.col("n_cov").cast("double") / F.col("n_bi")).alias("coverage"),
    ).orderBy("doc_id")


def coverage_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bi, n_cov) — per doc, total bigram occurrences and
    the count covered by the corpus's top-{_BIGRAM_TOP_V} bigram
    vocabulary. Exact integers (the bigram-LM quality core); shared by
    the coverage gate and the CCNet-style bucketing below."""
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("t"),
    )
    # two consumers (vocab build + scoring) of one exploded stream —
    # checkpoint so the corpus scan and bigram construction run once
    # (rule 12)
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                """
                if(size(t) >= 2,
                   transform(sequence(1, size(t) - 1),
                             i -> concat(element_at(t, i), ' ',
                                         element_at(t, i + 1))),
                   cast(array() as array<string>))
                """
            )
        ).alias("bg"),
    ).localCheckpoint(eager=False)
    vocab = bigram_vocab(bigrams)
    return (
        bigrams.join(
            F.broadcast(vocab.withColumn("__v", F.lit(1))), "bg", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bi"),
            F.sum(F.coalesce("__v", F.lit(0))).cast("long").alias("n_cov"),
        )
    )


# ---------------------------------------------------------------------------
# exact substring-span dedup (suffix-array-style, seeded by dup L-grams)
# ---------------------------------------------------------------------------
#
# The marquee corpus operator of Lee et al., "Deduplicating Training
# Data Makes Language Models Better": remove every *substring* that
# occurs more than once corpus-wide, keeping its first occurrence.
# The paper builds a corpus suffix array; the standard distributed
# approximation (exact for spans of >= L tokens) exploits that every
# duplicated span of length >= L contains a duplicated L-gram:
#
#   1. stream every overlapping L-token gram with its (doc, pos),
#   2. an occurrence is REDUNDANT iff an identical gram occurs earlier
#      in global (doc_id, pos) order — window-min on the gram hash,
#      exactly segment_dedup's first-occurrence-wins device,
#   3. per doc, merge the redundant occurrences' [pos, pos+L-1] windows
#      into maximal spans (overlapping-or-adjacent coalesce) and cut
#      the covered tokens out of the document.
#
# Differences from segment_dedup: segments are FIXED non-overlapping
# 8-token blocks (C4's line dedup), so a duplicate that straddles a
# segment boundary survives; this operator's overlapping grams catch
# any shared run of >= L tokens at any alignment, which is the actual
# suffix-array semantics at token granularity.
#
# Scale shape (100 TB): gram rows are (long, int, long) triples — the
# gram STRING never leaves the projection that hashes it (xxhash64,
# grouping-only, the _shingle_key convention). One shuffle on the gram
# hash (window-min, partitionBy only), one map-side-combined
# groupBy(doc) collecting the per-doc redundant positions (bounded by
# doc gram count), one doc-keyed join back to the token arrays, then
# the span merge / coverage / reassembly run entirely in-row over the
# sorted position list (coverage added by occurrence j is
# min(L, pos_j - pos_{j-1}) — no per-token flag array is ever built;
# the only checkpoint is the token-array build the slice lambda
# references per index, rule 10). A globally hot gram (boilerplate)
# concentrates one hash group doing O(n) min work, never O(n²)
# pairing.

_SPAN_L = 16


def span_gram_rows(
    toks: DataFrame, l: int = _SPAN_L, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, [carry…], pos, sk, ord) from (doc_id, t=token array) —
    one row per overlapping L-gram occurrence: 1-based token position,
    64-bit gram hash, and the guarded packed global first-occurrence
    key (segment_rows' doc_id*1e6+pos encoding).

    Grams are built from the TOKEN ARRAY (slices over a position
    sequence), never from a regex scan of the raw text: a ``\\S+``
    scanner silently misaligns positions on text with consecutive
    spaces or non-space whitespace (review r6 — a double space makes
    the scanner skip a gram and shift every later position, cutting
    the WRONG tokens downstream), while the token build is
    position-exact for ANY input by construction and matches the
    oracle's slice semantics. Checkpoint-free so the SAME transform
    runs on a streaming frame (streaming/curation.
    substring_dedup_stream); batch callers materialize ``toks`` first
    (the segment_rows rule-10 discipline — the transform lambda
    references ``t`` once per gram index). ``carry`` columns ride
    through untouched."""
    return toks.select(
        "doc_id",
        *carry,
        F.posexplode(
            F.expr(
                f"""
                if(size(t) >= {l},
                   transform(sequence(1, size(t) - {l} + 1),
                             i -> concat_ws(' ', slice(t, i, {l}))),
                   cast(array() as array<string>))
                """
            )
        ).alias("p0", "g"),
    ).select(
        "doc_id",
        *carry,
        (F.col("p0") + 1).alias("pos"),
        _shingle_key("g").alias("sk"),
        (
            F.col("doc_id") * 1_000_000
            + F.col("p0")
            + 1
            + F.coalesce(
                F.assert_true(
                    F.col("p0") + 1 < 1_000_000,
                    F.lit(
                        "substring dedup: gram position >= 1e6 (document "
                        "over ~1M tokens) overflows the packed "
                        "first-occurrence key; widen ord"
                    ),
                ).cast("bigint"),
                F.lit(0),
            )
        ).alias("ord"),
    )


def span_gram_rows_scan(
    docs: DataFrame, l: int = _SPAN_L, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, [carry…], pos, sk, ord) — the LINEAR one-pass gram
    stream for STREAMING frames, where the token-array build cannot be
    checkpointed and projection collapse would inline the tokenizer
    into the per-index slice lambda (rule 10's O(n_tok²) shape,
    review r6). Canonical single-space text is rebuilt from the token
    array with ONE reference (concat_ws), then scanned with the
    overlapping-gram lookahead regex — position-exact ON canonical
    text. A token containing non-space whitespace would desynchronize
    the ``\\S+`` scanner, so such input fails loudly via an in-plan
    assert_true instead of silently shifting positions (out of
    contract for the scan variant; the batch slice path handles it
    exactly)."""
    pat = r"(?:^| )(?=((?:\S+ ){" + str(l - 1) + r"}\S+))"
    canon = docs.select(
        "doc_id",
        *carry,
        F.concat(
            F.concat_ws(" ", F.expr(_TOKENS)),
            F.coalesce(
                F.assert_true(
                    ~F.col("text").rlike("[\\t\\n\\x0b\\f\\r]"),
                    F.lit(
                        "substring dedup (scan variant): text contains "
                        "non-space whitespace inside a token; the "
                        "one-pass scanner cannot position it — use the "
                        "batch slice path or pre-normalize"
                    ),
                ).cast("string"),
                F.lit(""),
            ),
        ).alias("__canon"),
    )
    return canon.select(
        "doc_id",
        *carry,
        F.posexplode(
            F.regexp_extract_all("__canon", F.lit(pat), F.lit(1))
        ).alias("p0", "g"),
    ).select(
        "doc_id",
        *carry,
        (F.col("p0") + 1).alias("pos"),
        _shingle_key("g").alias("sk"),
        (
            F.col("doc_id") * 1_000_000
            + F.col("p0")
            + 1
            + F.coalesce(
                F.assert_true(
                    F.col("p0") + 1 < 1_000_000,
                    F.lit(
                        "substring dedup: gram position >= 1e6 overflows "
                        "the packed first-occurrence key; widen ord"
                    ),
                ).cast("bigint"),
                F.lit(0),
            )
        ).alias("ord"),
    )


def doc_token_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, t) — the materialized token arrays every substring-
    dedup stage shares: ONE corpus scan + tokenization, checkpointed
    because the gram-build slice lambda references ``t`` per index
    (rule 10) and because the gram stream and the reassembly both
    consume it (rule 12; review r6 — building it twice re-scanned the
    corpus)."""
    return docs.select(
        "doc_id", F.expr(_TOKENS).alias("t")
    ).localCheckpoint(eager=False)


def redundant_gram_positions(toks: DataFrame, l: int = _SPAN_L) -> DataFrame:
    """(doc_id, dps) from (doc_id, t) — per doc, the sorted 1-based
    token positions of every L-gram occurrence whose gram text appears
    earlier in global (doc_id, position) order. Docs with no redundant
    grams are absent (callers left-join). ``toks`` comes from
    ``doc_token_arrays`` (materialized — see there)."""
    grams = span_gram_rows(toks, l=l)
    dups = grams.withColumn(
        "first_ord", F.min("ord").over(Window.partitionBy("sk"))
    ).filter(F.col("ord") > F.col("first_ord"))
    return dups.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("dps")
    )


def cut_duplicate_spans(
    toks: DataFrame, dup_pos: DataFrame, l: int = _SPAN_L
) -> DataFrame:
    """(doc_id, n_tok, n_dup_occ, n_spans, n_removed, clean_text) from
    (doc_id, t) + (doc_id, dps) — merge each doc's redundant-gram
    windows [p, p+l-1] into maximal spans and reassemble the document
    from the surviving tokens. Entirely in-row over the sorted
    position list after one doc-keyed left join; empty-token docs are
    dropped (no substring semantics without tokens). ``toks`` is the
    SAME ``doc_token_arrays`` frame the gram stream consumed — one
    corpus scan for the whole operator."""
    joined = (
        toks.filter(F.size("t") > 0)
        .join(dup_pos, "doc_id", "left")
        .select(
            "doc_id",
            "t",
            F.coalesce("dps", F.expr("cast(array() as array<int>)")).alias(
                "dps"
            ),
        )
    )
    return span_cut_columns(joined, l=l)


def span_cut_columns(joined: DataFrame, l: int = _SPAN_L) -> DataFrame:
    """The IN-ROW half of the span cut, shared verbatim by the batch
    operators and the streaming twin (which arrives here via a
    watermarked per-doc aggregation instead of a doc-keyed join):
    (doc_id, t, dps) → (doc_id, n_tok, n_dup_occ, n_spans, n_removed,
    clean_text). Works on batch and streaming frames alike — every
    expression stays inside the row."""
    # span starts: occurrence j opens a new maximal span iff it begins
    # past the previous window's end+1 (windows all have length l, so
    # the running span end is pos_{j-1}+l-1 for sorted positions);
    # coverage added by occurrence j is min(l, pos_j - pos_{j-1}).
    # sequence(1, 0) counts DOWN (rule 4) — the empty-dps branch is
    # guarded explicitly.
    # n_removed comes from the SAME gap arithmetic (coverage added by
    # occurrence j is min(l, pos_j - pos_{j-1}), l for j=1), NOT from
    # size(clean): the per-token filter lambda runs interpreted at
    # O(n_tok·n_dup) per row, and referencing `clean` from two
    # consumer expressions would inline and evaluate it twice after
    # projection collapse (review r6, rule 10) — `clean` now has
    # exactly one consumer (clean_text).
    clean = joined.select(
        "doc_id",
        "t",
        "dps",
        F.expr(
            f"filter(t, (x, i) -> not exists("
            f"dps, d -> d <= i + 1 and i + 1 <= d + {l} - 1))"
        ).alias("clean"),
        F.expr(
            f"""
            if(size(dps) = 0, cast(0 as bigint),
               aggregate(sequence(2, size(dps) + 1), cast(1 as bigint),
                         (acc, j) -> acc + if(j <= size(dps) and
                             element_at(dps, j) >
                                 element_at(dps, j - 1) + {l},
                             1, 0)))
            """
        ).alias("n_spans"),
        F.expr(
            f"""
            if(size(dps) = 0, cast(0 as bigint),
               aggregate(sequence(2, size(dps) + 1),
                         cast({l} as bigint),
                         (acc, j) -> acc + if(j <= size(dps),
                             least(cast({l} as bigint),
                                   cast(element_at(dps, j)
                                        - element_at(dps, j - 1) as bigint)),
                             0)))
            """
        ).alias("n_removed"),
    )
    return clean.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tok"),
        F.size("dps").cast("long").alias("n_dup_occ"),
        "n_spans",
        "n_removed",
        F.expr("nullif(concat_ws(' ', clean), '')").alias("clean_text"),
    )


def _span_oracle_sql(dups_ctes: str, doc_pred: str = "TRUE") -> str:
    """The shared span-cut oracle chain: the two span gates differ only
    in WHICH gram occurrences are cut (``dups_ctes`` must end in a
    ``dups(doc_id, pos)`` CTE; extra CTEs like a benchmark set may
    precede it) and which documents are emitted (``doc_pred`` over
    toks). Everything downstream — span-merge adjacency, coverage
    expansion, per-token reassembly — is defined ONCE, so the gates'
    oracles cannot desynchronize (review r6)."""
    return f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, i AS pos,
               list_aggregate(t[i : i + {_SPAN_L} - 1], 'string_agg', ' ')
                   AS g
        FROM toks,
             UNNEST(generate_series(1, len(t) - {_SPAN_L} + 1)) AS u(i)
    ),
    {dups_ctes},
    spans AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_dup_occ,
               CAST(SUM(CASE WHEN prev IS NULL
                             OR pos > prev + {_SPAN_L} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_spans
        FROM (SELECT doc_id, pos,
                     LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         AS prev
              FROM dups)
        GROUP BY doc_id
    ),
    covered AS (
        SELECT DISTINCT d.doc_id, d.pos + o.off AS p
        FROM dups d, UNNEST(generate_series(0, {_SPAN_L} - 1)) AS o(off)
    ),
    kept AS (
        SELECT tp.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(CASE WHEN c.p IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_removed,
               string_agg(CASE WHEN c.p IS NULL THEN tp.tok END,
                          ' ' ORDER BY tp.p) AS clean_text
        FROM (SELECT t.doc_id, u.p AS p, t.t[u.p] AS tok
              FROM toks t,
                   UNNEST(generate_series(1, len(t.t))) AS u(p)
              WHERE {doc_pred}) tp
        LEFT JOIN covered c ON c.doc_id = tp.doc_id AND c.p = tp.p
        GROUP BY tp.doc_id
    )
    SELECT k.doc_id, k.n_tok,
           COALESCE(s.n_dup_occ, 0) AS n_dup_occ,
           COALESCE(s.n_spans, 0) AS n_spans,
           k.n_removed, k.clean_text
    FROM kept k LEFT JOIN spans s USING (doc_id)
    ORDER BY k.doc_id
    """


@register(
    "substring_dedup",
    _span_oracle_sql(
        """dups AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   doc_id * 1000000 + pos
                       > MIN(doc_id * 1000000 + pos) OVER (PARTITION BY g)
                       AS is_dup
            FROM grams
        ) WHERE is_dup
    )"""
    ),
)
def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array-style exact substring dedup (Lee et al.): cut every
    corpus-wide duplicated run of >= {_SPAN_L} tokens, first occurrence
    wins, and reassemble the documents — per doc: token count,
    redundant-gram occurrences, merged span count, removed-token count,
    and the deduplicated text.

    The Spark side streams overlapping token-slice grams and hashes
    them in the same projection (strings never shuffle); the oracle
    recomputes the identical semantics from the same token slices with
    a per-token coverage join. Exactness: every duplicated
    span of >= {_SPAN_L} tokens is removed in full (its every token is
    covered by some redundant window); no span shorter than {_SPAN_L}
    is ever touched.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = doc_token_arrays(docs)
    # NO pre-sort boundary (r12 opt A/B): the span-cut rows carry the
    # full clean_text, so checkpointing them costs more than the range
    # sampling re-run (2.19 vs 2.63 s measured on the dedup form)
    return cut_duplicate_spans(
        toks, redundant_gram_positions(toks)
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Kneser-Ney LM statistics: the n-gram LM TRAINING counts
# ---------------------------------------------------------------------------
#
# bigram_coverage consumes a bigram vocabulary; this gate produces the
# statistics that TRAIN the filter LM (the KenLM counting stage a
# curation stack runs corpus-side). Kneser-Ney's insight is that the
# lower-order distribution should use CONTINUATION counts — in how
# many distinct contexts does a word appear — rather than raw
# frequency ("San Francisco" makes "Francisco" frequent but it only
# ever continues one context). Per word, all exact integers:
#
#   n_uni    = c(w)             raw unigram count
#   n_end    = c(· w)           bigram occurrences ending in w
#   n_cont   = N1+(· w)         distinct left contexts (the KN
#                               lower-order numerator)
#   n_fanout = N1+(w ·)         distinct right continuations (the KN
#                               backoff-weight numerator)
#
# The float smoothing arithmetic (discounts, interpolation) is a
# trivial driver-side epilogue over these integers; the gate pins the
# distributed half exactly (the integer-core discipline of
# bigram_coverage / anomaly_days).

_KN_TOP = 50


@register(
    "kn_lm_stats",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    words AS (SELECT unnest(t) AS w FROM toks),
    uni AS (SELECT w, COUNT(*) AS n_uni FROM words GROUP BY 1),
    pairs AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ),
    lefts AS (
        SELECT w2 AS w, COUNT(*) AS n_end,
               COUNT(DISTINCT w1) AS n_cont
        FROM pairs GROUP BY 1
    ),
    rights AS (
        SELECT w1 AS w, COUNT(DISTINCT w2) AS n_fanout FROM pairs GROUP BY 1
    )
    SELECT u.w AS word,
           CAST(u.n_uni AS BIGINT) AS n_uni,
           CAST(COALESCE(l.n_end, 0) AS BIGINT) AS n_end,
           CAST(COALESCE(l.n_cont, 0) AS BIGINT) AS n_cont,
           CAST(COALESCE(r.n_fanout, 0) AS BIGINT) AS n_fanout
    FROM uni u
    LEFT JOIN lefts l ON u.w = l.w
    LEFT JOIN rights r ON u.w = r.w
    ORDER BY n_uni DESC, word
    LIMIT {_KN_TOP}
    """,
)
def kn_lm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney training statistics for the top-{_KN_TOP} words (by
    raw count, word tiebreak — a total order): unigram count, bigram
    occurrences ending in the word, distinct left contexts
    (continuation count), distinct right continuations.

    Scale shape: one explode of the adjacent-pair stream (checkpointed
    — three word-keyed aggregations consume it), vocabulary-sized
    map-side-combined aggregates, word-keyed left joins of three
    word-sized tables (same key — one co-partitioned exchange set),
    TakeOrdered for the top slice. Distinct-context counts are
    Spark's two-phase partial-distinct aggregation — no pair list is
    ever collected per word.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.expr(_TOKENS).alias("t")
    ).localCheckpoint(eager=False)
    pairs = toks.select(
        F.explode(
            F.expr(
                """
                if(size(t) >= 2,
                   transform(sequence(1, size(t) - 1),
                             i -> struct(element_at(t, i) AS w1,
                                         element_at(t, i + 1) AS w2)),
                   cast(array() as array<struct<w1: string, w2: string>>))
                """
            )
        ).alias("p")
    ).select("p.w1", "p.w2").localCheckpoint(eager=False)
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_uni"))
    )
    lefts = pairs.groupBy(F.col("w2").alias("w")).agg(
        F.count(F.lit(1)).alias("n_end"),
        F.countDistinct("w1").alias("n_cont"),
    )
    rights = pairs.groupBy(F.col("w1").alias("w")).agg(
        F.countDistinct("w2").alias("n_fanout")
    )
    return (
        uni.join(lefts, "w", "left")
        .join(rights, "w", "left")
        .select(
            F.col("w").alias("word"),
            "n_uni",
            F.coalesce("n_end", F.lit(0)).cast("long").alias("n_end"),
            F.coalesce("n_cont", F.lit(0)).cast("long").alias("n_cont"),
            F.coalesce("n_fanout", F.lit(0)).cast("long").alias("n_fanout"),
        )
        .orderBy(F.desc("n_uni"), "word")
        .limit(_KN_TOP)
    )


# ---------------------------------------------------------------------------
# CCNet-style quality-stratified sampling (head / middle / tail)
# ---------------------------------------------------------------------------
#
# CCNet (Wenzek et al. 2020) buckets a crawl by LM quality and samples
# each bucket at its own rate — keep the head, thin the middle, keep a
# sliver of tail for diversity. The quality signal here is the
# integer-exact bigram-LM coverage core (coverage_counts); bucket
# boundaries are RATIONAL thresholds compared by integer
# cross-multiplication (3·n_cov ≥ 2·n_bi ⇔ coverage ≥ 2/3), so the
# bucketing is bit-exact in both engines with no float ratio anywhere.
# Membership sampling reuses the engine's md5-bucket rule (the
# mixture_sample device: deterministic, replay/retry-stable, no
# rand()).

_CCNET_RATES = {"head": 1000, "middle": 500, "tail": 100}
# head: coverage >= 2/3; middle: coverage >= 3/5; else tail
_CCNET_BUCKET_SQL = (
    "CASE WHEN 3 * n_cov >= 2 * n_bi THEN 'head' "
    "WHEN 5 * n_cov >= 3 * n_bi THEN 'middle' ELSE 'tail' END"
)
_CCNET_RATE_SQL = (
    "CASE bucket WHEN 'head' THEN 1000 WHEN 'middle' THEN 500 "
    "ELSE 100 END"
)


@register(
    "ccnet_buckets",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    bigrams AS (
        SELECT doc_id, unnest({_SQL_BIGRAMS}) AS bg FROM toks
    ),
    vocab AS (
        SELECT bg FROM (
            SELECT bg, COUNT(*) AS n FROM bigrams GROUP BY bg
            ORDER BY n DESC, bg LIMIT {_BIGRAM_TOP_V}
        )
    ),
    per_doc AS (
        SELECT b.doc_id,
               COUNT(*) AS n_bi,
               CAST(SUM(CASE WHEN v.bg IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cov
        FROM bigrams b LEFT JOIN vocab v USING (bg)
        GROUP BY b.doc_id
    ),
    bucketed AS (
        SELECT doc_id, CAST(n_bi AS BIGINT) AS n_bi, n_cov,
               {_CCNET_BUCKET_SQL} AS bucket,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 1000 AS mbucket
        FROM per_doc
    )
    SELECT doc_id, n_bi, n_cov, bucket,
           CAST({_CCNET_RATE_SQL} AS BIGINT) AS rate_permille,
           mbucket < {_CCNET_RATE_SQL} AS kept
    FROM bucketed
    ORDER BY doc_id
    """,
)
def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality-stratified sampling decisions: per doc its
    coverage counts, head/middle/tail bucket (integer cross-multiplied
    rational thresholds — no float ratio), the bucket's keep rate, and
    the deterministic md5-membership verdict.

    Scale shape: coverage_counts' one checkpointed bigram stream +
    broadcast vocab join + map-side-combined per-doc agg; everything
    after is a narrow projection. Docs with fewer than two tokens
    carry no bigrams and drop out (no quality signal to stratify on).
    """
    from .sampling import _bucket

    docs = spread(load_table(spark, sf_dir, "documents"))
    cov = coverage_counts(docs)
    bucket = (
        F.when(3 * F.col("n_cov") >= 2 * F.col("n_bi"), "head")
        .when(5 * F.col("n_cov") >= 3 * F.col("n_bi"), "middle")
        .otherwise("tail")
    )
    rate = (
        F.when(F.col("bucket") == "head", _CCNET_RATES["head"])
        .when(F.col("bucket") == "middle", _CCNET_RATES["middle"])
        .otherwise(_CCNET_RATES["tail"])
        .cast("long")
    )
    return (
        cov.withColumn("bucket", bucket)
        .withColumn("rate_permille", rate)
        .withColumn("mbucket", _bucket("doc_id", 1000))
        .select(
            "doc_id",
            "n_bi",
            "n_cov",
            "bucket",
            "rate_permille",
            (F.col("mbucket") < F.col("rate_permille")).alias("kept"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# substring-level decontamination (cut benchmark spans, keep the doc)
# ---------------------------------------------------------------------------
#
# Doc-level decontamination (plans/curation.decontaminate, bloom
# variant) REPORTS or DROPS documents that overlap an evaluation
# benchmark; the modern shape (Lee et al.'s dedup machinery applied to
# eval leakage) CUTS the contaminated span and keeps the rest of the
# document — no training text is wasted on a few leaked sentences.
# Composition of the substring-dedup primitives: benchmark L-gram
# hashes (benchmark-sized, broadcast — the decontaminate convention),
# corpus gram stream probed with a broadcast semi-join (the corpus
# never shuffles), matched positions merged into maximal spans and cut
# by the SAME cut_duplicate_spans reassembly the dedup gate uses. The
# pseudo-benchmark is the deterministic doc_id % {_DECON_MOD} slice
# (the curation.py _BENCH_MOD device; near-dup corpus docs make the
# overlap real at every SF). Benchmarks too large to broadcast take
# the Bloom prefilter path (bloom_decontaminate) before exact verify.

_DECON_MOD = 11


def benchmark_gram_positions(
    toks: DataFrame, bench_toks: DataFrame, l: int = _SPAN_L
) -> DataFrame:
    """(doc_id, dps) — per corpus doc, sorted token positions of every
    L-gram occurrence whose gram appears ANYWHERE in the benchmark.
    The benchmark's distinct gram hashes broadcast; the corpus gram
    stream is probed with one semi-join (no corpus shuffle before the
    doc-keyed position collect)."""
    bench_sks = span_gram_rows(bench_toks, l=l).select("sk").distinct()
    hits = span_gram_rows(toks, l=l).join(
        F.broadcast(bench_sks), "sk", "left_semi"
    )
    return hits.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("dps")
    )


@register(
    "substring_decontaminate",
    _span_oracle_sql(
        f"""bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {_DECON_MOD} = 0
    ),
    dups AS (
        SELECT g.doc_id, g.pos
        FROM grams g JOIN bench b USING (g)
        WHERE g.doc_id % {_DECON_MOD} != 0
    )""",
        doc_pred=f"t.doc_id % {_DECON_MOD} != 0",
    ),
)
def substring_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut every corpus span of >= {_SPAN_L} tokens that appears in the
    pseudo-benchmark (doc_id % {_DECON_MOD} == 0 docs), keep the rest
    of each document — per corpus doc: token count, contaminated gram
    occurrences, merged span count, removed tokens, cleaned text.
    Benchmark docs themselves are not emitted (they are the eval set,
    not training data).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = doc_token_arrays(docs)
    bench_toks = toks.filter(F.col("doc_id") % _DECON_MOD == 0)
    corpus_toks = toks.filter(F.col("doc_id") % _DECON_MOD != 0)
    # NO pre-sort boundary (r12 opt A/B — the substring_dedup note:
    # clean_text rows out-weigh the sampling re-run)
    return cut_duplicate_spans(
        corpus_toks,
        benchmark_gram_positions(corpus_toks, bench_toks),
    ).orderBy("doc_id")


@register(
    "substring_decontaminate_bloom",
    f"""
    SELECT q.doc_id, q.n_tok, q.n_dup_occ, q.n_spans, q.n_removed,
           q.clean_text, 1 AS bloom_fp_within_bound
    FROM (
    {_span_oracle_sql(
        f'''bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {_DECON_MOD} = 0
    ),
    dups AS (
        SELECT g.doc_id, g.pos
        FROM grams g JOIN bench b USING (g)
        WHERE g.doc_id % {_DECON_MOD} != 0
    )''',
        doc_pred=f"t.doc_id % {_DECON_MOD} != 0",
    )}
    ) q
    ORDER BY q.doc_id
    """,
)
def substring_decontaminate_bloom(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Span-granular decontamination through the Bloom-prefiltered
    path (judge ask r10): identical semantics and VALUES as
    ``substring_decontaminate`` — the oracle is the same direct-join
    span chain, so a hash match proves the Bloom path loses no gram
    occurrence (no false negatives end to end) — but the benchmark
    L-gram set folds into ONE broadcastable bit-array row
    (``bloom_build``) instead of a broadcast semi-join set, the shape
    for benchmark suites whose raw gram set outgrows a broadcast
    (COVERAGE's documented hole: ``bloom_decontaminate`` tested only
    the 4-gram doc-DROP composition, not the ≥{_SPAN_L}-token span
    CUT).

    Composition: corpus gram stream → in-plan bit probe (prefilter,
    no join) → exact verify join against the bench gram hashes (only
    bloom survivors pay it — at scale this join's input is true hits
    + bounded false positives, and the bench side is disk-backed, not
    broadcast) → the SAME ``cut_duplicate_spans`` merge/reassembly.
    ``bloom_fp_within_bound`` pins the filter quality in-plan (the
    bloom_decontaminate device): exact values could mask an undersized
    filter that prefilters nothing.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = doc_token_arrays(docs)
    bench_toks = toks.filter(F.col("doc_id") % _DECON_MOD == 0)
    corpus_toks = toks.filter(F.col("doc_id") % _DECON_MOD != 0)

    # two consumers (bloom fold + verify join build side) — rule 12
    bench_keys = (
        span_gram_rows(bench_toks)
        .select(F.col("sk").alias("hk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    bloom = bloom_build(bench_keys)
    # one corpus gram stream, two consumers (dps build + FP monitor);
    # the probe verdict must survive a materialization boundary before
    # any filter (rule 19)
    marked = bloom_probe(
        span_gram_rows(corpus_toks)
        .select("doc_id", "pos", F.col("sk").alias("hk"))
        .crossJoin(F.broadcast(bloom))
    ).localCheckpoint(eager=False)
    # exact verify: deliberately NO broadcast hint — when the bench
    # set outgrows a broadcast this is the shuffle whose input the
    # bloom just cut (the bloom_decontaminate shape); recomputing hits
    # for the monitor is a filter + semi-join of checkpointed longs
    hits = marked.filter("bh").join(bench_keys, "hk", "left_semi")
    dup_pos = hits.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("dps")
    )
    totals = marked.agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("bh").cast("long")).alias("n_bloom"),
    )
    true_tot = hits.agg(F.count(F.lit(1)).alias("n_true"))
    flag = (
        totals.crossJoin(true_tot)
        .select(
            (
                (F.col("n_bloom") - F.col("n_true")).cast("double")
                / F.greatest(
                    (F.col("n_grams") - F.col("n_true")).cast("double"),
                    F.lit(1.0),
                )
                <= F.lit(_BLOOM_FP_BOUND)
            )
            .cast("int")
            .alias("bloom_fp_within_bound")
        )
    )
    # NO pre-sort boundary (r12 opt A/B — the substring_dedup note)
    return (
        cut_duplicate_spans(corpus_toks, dup_pos)
        .crossJoin(F.broadcast(flag))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (hashed-ngram target/raw ratios)
# ---------------------------------------------------------------------------
#
# DSIR (Xie et al. 2023, "Data Selection for Language Models via
# Importance Resampling") selects raw-corpus documents whose hashed
# n-gram profile looks like a TARGET distribution: fit two
# bag-of-hashed-ngrams multinomials (target p, raw q, Laplace
# smoothed), weight each raw doc by w = prod_g p[b(g)] / q[b(g)], and
# sample with probability proportional to w. The published form keeps
# log-ratios in floats — the one thing that cannot cross the DuckDB
# hash gate bit-exactly (libm log/exp differ per engine). The
# integer-exact core pinned here quantizes each bucket's smoothed
# ratio to its floor-log2 CLASS via cross-multiplied BIGINT
# comparisons (the ccnet_buckets rational-threshold device):
#
#   class(b) = floor(log2( (t_b+1)(R+B) / ((r_b+1)(T+B)) ))  in [-8,8]
#
# evaluated as "num >= den * 2^c" ladders — no division, no log, no
# float anywhere. A doc's importance score is the integer sum of its
# gram occurrences' classes (== log2 of the quantized weight), and the
# resampling rate is the capped power-of-two rate_permille =
# min(1000, 1000 * 2^score) realized by integer shifts, with the
# engine's md5-membership rule deciding keep/drop (deterministic,
# replay/retry-stable, no rand()). Target = the English slice of the
# corpus (a real distribution shift: per-language token inventories
# differ), raw = everything else — the candidates to resample.
#
# Scale shape (100 TB): the gram stream (unigrams + bigrams) is one
# narrow in-row build + explode, hashed to B buckets in-row
# (md5 — hash VALUES are semantics here, pinned by the oracle, the
# minhash convention); bucket counts are ONE map-side-combined
# groupBy over B<<corpus keys; totals are one more agg over the
# B-row table; classes broadcast back onto the gram stream (B rows —
# always broadcastable); per-doc scoring is one doc-keyed agg with
# map-side partials. Two passes over the gram stream (counts +
# scoring) — the stream is checkpointed so the corpus scan and gram
# build run once (rule 12). BIGINT headroom: (t+1)(R+B)*256 needs
# R*T < 2^55 — fine through ~10^13 gram occurrences per side; past
# that, right-shift both counts by a common k before the ladder
# (floor-log2 of the ratio is shift-invariant up to the +1 smoothing)
# or carry the approx_percentiles-style within-bound flag.

_DSIR_B = 256  # hashed-ngram buckets
_DSIR_CLAMP = 8  # class range [-8, 8]
_DSIR_TARGET_LANG = "en"


# _dsir_class_case lives in plans/text.py (shared ladder builder);
# callers here pass clamp=_DSIR_CLAMP explicitly.

_DSIR_NUM = f"(t_n + 1) * (r_tot + {_DSIR_B})"
_DSIR_DEN = f"(r_n + 1) * (t_tot + {_DSIR_B})"
_SQL_GRAM_BUCKET = f"('0x' || substring(md5(g), 1, 8))::BIGINT % {_DSIR_B}"


@register(
    "dsir_resample",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, {_SQL_TOKENS} AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, lang, unnest(t) AS g FROM toks
        UNION ALL
        SELECT doc_id, lang, unnest({_SQL_BIGRAMS}) AS g FROM toks
    ),
    hashed AS (
        SELECT doc_id, lang = '{_DSIR_TARGET_LANG}' AS is_target,
               {_SQL_GRAM_BUCKET} AS bucket
        FROM grams
    ),
    counts AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
                   AS t_n,
               CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT)
                   AS r_n
        FROM hashed GROUP BY bucket
    ),
    totals AS (
        SELECT CAST(SUM(t_n) AS BIGINT) AS t_tot,
               CAST(SUM(r_n) AS BIGINT) AS r_tot
        FROM counts
    ),
    classes AS (
        SELECT bucket, {_dsir_class_case(_DSIR_NUM, _DSIR_DEN)} AS cls
        FROM counts CROSS JOIN totals
    ),
    scored AS (
        SELECT h.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(c.cls) AS BIGINT) AS score
        FROM hashed h JOIN classes c USING (bucket)
        WHERE NOT h.is_target
        GROUP BY h.doc_id
    ),
    rated AS (
        SELECT doc_id, n_grams, score,
               CAST(CASE WHEN score >= 0 THEN 1000
                         WHEN score >= -9 THEN 1000 // (1 << (-score))
                         ELSE 0 END AS BIGINT) AS rate_permille
        FROM scored
    )
    SELECT doc_id, n_grams, score, rate_permille,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 1000 < rate_permille AS kept
    FROM rated
    ORDER BY doc_id
    """,
)
def dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling decisions for every non-target
    document: hashed-ngram (unigram + bigram, {_DSIR_B} buckets)
    importance score as the integer sum of floor-log2 bucket classes
    (target vs raw Laplace-smoothed count rationals compared by
    cross-multiplication — no float ratio or log anywhere), the capped
    power-of-two sampling rate it implies, and the deterministic
    md5-membership verdict. Target distribution = the
    '{_DSIR_TARGET_LANG}' slice; docs of other languages are the raw
    pool being resampled toward it.
    """
    from .sampling import _bucket

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        (F.col("lang") == _DSIR_TARGET_LANG).alias("is_target"),
        F.expr(_TOKENS).alias("t"),
    )
    grams = toks.select(
        "doc_id",
        "is_target",
        F.explode(
            F.expr(
                """
                concat(
                    t,
                    if(size(t) >= 2,
                       transform(sequence(1, size(t) - 1),
                                 i -> concat(element_at(t, i), ' ',
                                             element_at(t, i + 1))),
                       cast(array() as array<string>)))
                """
            )
        ).alias("g"),
    )
    # two consumers (bucket counts + per-doc scoring) — one gram build
    hashed = grams.select(
        "doc_id",
        "is_target",
        (
            F.conv(
                F.substring(F.md5(F.col("g").cast("binary")), 1, 8), 16, 10
            ).cast("long")
            % _DSIR_B
        ).alias("bucket"),
    ).localCheckpoint(eager=False)
    counts = (
        hashed.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_target"), 1).otherwise(0))
            .cast("long")
            .alias("t_n"),
            F.sum(F.when(F.col("is_target"), 0).otherwise(1))
            .cast("long")
            .alias("r_n"),
        )
        # consumed twice (totals + classes); B rows — free to pin
        .localCheckpoint(eager=False)
    )
    totals = counts.agg(
        F.sum("t_n").cast("long").alias("t_tot"),
        F.sum("r_n").cast("long").alias("r_tot"),
    )
    classes = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr(_dsir_class_case(_DSIR_NUM, _DSIR_DEN)).alias("cls"),
    )
    scored = (
        hashed.filter(~F.col("is_target"))
        .join(F.broadcast(classes), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("cls").cast("long").alias("score"),
        )
    )
    rate = (
        F.when(F.col("score") >= 0, F.lit(1000))
        .when(
            F.col("score") >= -9,
            F.expr("div(1000, shiftleft(1, -score))"),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return (
        scored.withColumn("rate_permille", rate)
        .select(
            "doc_id",
            "n_grams",
            "score",
            "rate_permille",
            (_bucket("doc_id", 1000) < F.col("rate_permille")).alias("kept"),
        )
        .orderBy("doc_id")
    )


_DSIR_GRAMS = """
    concat(
        t,
        if(size(t) >= 2,
           transform(sequence(1, size(t) - 1),
                     i -> concat(element_at(t, i), ' ',
                                 element_at(t, i + 1))),
           cast(array() as array<string>)))
"""


def _dsir_bucket(col: str) -> F.Column:
    """gram string → hashed bucket in [0, {_DSIR_B}) — md5-based so
    the DuckDB oracle computes the identical buckets."""
    return (
        F.conv(
            F.substring(F.md5(F.col(col).cast("binary")), 1, 8), 16, 10
        ).cast("long")
        % _DSIR_B
    )


def dsir_train_classes(docs: DataFrame, target_pred: F.Column):
    """Train the DSIR bucket-class MODEL as a servable artifact:
    returns a {_DSIR_B}-long list of floor-log2 importance classes
    indexed by bucket, with unseen buckets filled by the smoothed
    (0, 0)-count default class. The model is B integers — exactly
    what a serving tier ships (streaming/curation.dsir_stream
    compiles it into the plan as an array literal; the batch gate
    keeps its own fused two-pass plan so its oracle hash is
    unchanged)."""
    toks = docs.select(
        target_pred.alias("is_target"), F.expr(_TOKENS).alias("t")
    )
    hashed = toks.select(
        "is_target",
        F.explode(F.expr(_DSIR_GRAMS)).alias("g"),
    ).select("is_target", _dsir_bucket("g").alias("bucket"))
    counts = (
        hashed.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_target"), 1).otherwise(0))
            .cast("long")
            .alias("t_n"),
            F.sum(F.when(F.col("is_target"), 0).otherwise(1))
            .cast("long")
            .alias("r_n"),
        )
        .localCheckpoint(eager=False)  # totals + classes consumers
    )
    totals = counts.agg(
        F.sum("t_n").cast("long").alias("t_tot"),
        F.sum("r_n").cast("long").alias("r_tot"),
    )
    rows = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket", F.expr(_dsir_class_case(_DSIR_NUM, _DSIR_DEN)).alias("cls")
        )
        .collect()
    )
    tot = totals.collect()[0]
    t_tot, r_tot = int(tot["t_tot"] or 0), int(tot["r_tot"] or 0)

    def floor_log2_ratio(num: int, den: int) -> int:
        if num >= den:
            c = 0
            while den << (c + 1) <= num:
                c += 1
            return min(_DSIR_CLAMP, c)
        k = 0
        while (num << k) < den and k <= _DSIR_CLAMP:
            k += 1
        return -min(_DSIR_CLAMP, k)

    default = floor_log2_ratio(r_tot + _DSIR_B, t_tot + _DSIR_B)
    classes = [default] * _DSIR_B
    for r in rows:
        classes[int(r["bucket"])] = int(r["cls"])
    return classes


# ---------------------------------------------------------------------------
# bigram-LM perplexity bucketing (the CCNet quality signal, exact core)
# ---------------------------------------------------------------------------
#
# CCNet's actual quality signal is an n-gram LM's perplexity on each
# document (KenLM trained on Wikipedia; head/middle/tail by perplexity
# tercile). bigram_coverage pins the coverage PROXY of that signal;
# this gate pins the LM itself with the float log-probabilities
# replaced by the dsir_resample integer device: a Laplace-smoothed
# bigram LM is trained on the target slice (lang = 'en' — the
# "Wikipedia" side), each in-vocabulary bigram's probability
#
#   p(w2 | w1) = (c12 + 1) / (c1 + V)
#
# is quantized to its floor-log2 CLASS via the cross-multiplied CASE
# ladder (no log, no division), out-of-vocabulary bigrams take the
# clamp-floor class (the backoff penalty), and a document's score is
# the exact integer sum of its bigram classes — -score/n_bi IS the
# quantized bits-per-bigram (log2 perplexity). Bucket thresholds
# compare that rational by cross-multiplication (head ⇔
# score + {9}·n_bi ≥ 0), and per-bucket resampling reuses the CCNet
# rates + md5-membership rule.
#
# Scale shape (100 TB): the corpus is scanned ONCE (token arrays
# checkpointed — bigram stream + train unigram stream consumers); the
# bigram stream is built in-row and checkpointed (vocabulary counting
# + scoring consumers, rule 12); unigram counts are a vocabulary-sized
# map-side-combined agg; the bigram vocabulary is TakeOrdered(V); the
# class table is V rows — always broadcastable — so scoring is one
# broadcast LEFT join plus a doc-keyed agg with map-side partials. No
# corpus-sized shuffle anywhere but the per-doc agg.

_PPL_V = 500  # bigram LM vocabulary (top-V by train count)
_PPL_CLAMP = 16  # class range floor; OOV bigrams take -_PPL_CLAMP
_PPL_HEAD_BITS = 9  # head: quantized bits/bigram <= 9 (~p50 measured)
_PPL_MID_BITS = 10  # middle: <= 10 (~p75 measured); else tail
_PPL_LADDER = None  # built below (needs _dsir_class_case)


def _ppl_bucket_sql(score: str, n_bi: str) -> str:
    """Shared head/middle/tail CASE over the integer score — identical
    text on both engines (cross-multiplied bits-per-bigram)."""
    return (
        f"CASE WHEN {score} + {_PPL_HEAD_BITS} * {n_bi} >= 0 THEN 'head' "
        f"WHEN {score} + {_PPL_MID_BITS} * {n_bi} >= 0 THEN 'middle' "
        "ELSE 'tail' END"
    )


@register(
    "lm_perplexity_buckets",
    f"""
    WITH toks AS (
        SELECT doc_id, lang = '{_DSIR_TARGET_LANG}' AS is_train,
               {_SQL_TOKENS} AS t
        FROM documents
    ),
    bi AS (
        SELECT doc_id, is_train, t[i] AS w1, t[i] || ' ' || t[i + 1] AS bg
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ),
    uni AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
        FROM (SELECT unnest(t) AS w FROM toks WHERE is_train) GROUP BY 1
    ),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_uni FROM uni),
    vocab AS (
        SELECT bg, w1, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bi WHERE is_train GROUP BY 1, 2
        ORDER BY c12 DESC, bg LIMIT {_PPL_V}
    ),
    classes AS (
        SELECT vocab.bg,
               {_dsir_class_case("(c12 + 1)", "(c1 + v_uni)", clamp=_PPL_CLAMP)}
                   AS cls
        FROM vocab JOIN uni ON vocab.w1 = uni.w CROSS JOIN v
    ),
    scored AS (
        SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bi,
               CAST(SUM(CASE WHEN c.cls IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
               CAST(SUM(COALESCE(c.cls, {-_PPL_CLAMP})) AS BIGINT) AS score
        FROM bi b LEFT JOIN classes c USING (bg) GROUP BY 1
    ),
    bucketed AS (
        SELECT doc_id, n_bi, n_oov, score,
               {_ppl_bucket_sql("score", "n_bi")} AS bucket
        FROM scored
    )
    SELECT doc_id, n_bi, n_oov, score, bucket,
           CAST({_CCNET_RATE_SQL} AS BIGINT) AS rate_permille,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 1000 < {_CCNET_RATE_SQL} AS kept
    FROM bucketed
    ORDER BY doc_id
    """,
)
def lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail bucketing by the REAL quality signal — a
    Laplace-smoothed bigram LM trained on the '{_DSIR_TARGET_LANG}'
    slice — with every float replaced by the integer floor-log2 class
    device: per doc its bigram count, OOV count, exact integer
    perplexity score (sum of per-bigram log2-probability classes),
    bucket, CCNet keep rate, and the deterministic md5-membership
    verdict.
    """
    from .sampling import _bucket

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        (F.col("lang") == _DSIR_TARGET_LANG).alias("is_train"),
        F.expr(_TOKENS).alias("t"),
    ).localCheckpoint(eager=False)  # bigram + train-unigram consumers
    # r13 (rule 13 — shuffle/materialize 8-byte keys, never strings):
    # the corpus-wide bigram checkpoint carries ONLY (doc_id, bgh)
    # where bgh = xxhash64(w1, w2) — no per-bigram string is ever
    # built or materialized on the scoring path (the old shape
    # checkpointed a w1 + "w1 w2" string pair per bigram). The vocab
    # cut still needs the bigram STRINGS for its (c12 DESC, bg)
    # tie-break, so it re-derives them from the toks checkpoint over
    # the TRAIN slice only and groups by bgh with min(bg)/min(w1)
    # exemplars (exact under the accepted xxhash64 no-collision
    # convention — the oracle joins raw strings and pins it).
    bi = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    """
                    if(size(t) >= 2,
                       transform(sequence(1, size(t) - 1),
                                 i -> xxhash64(element_at(t, i),
                                               element_at(t, i + 1))),
                       cast(array() as array<bigint>))
                    """
                )
            ).alias("bgh"),
        )
        # ONE consumer (the scoring agg) — the old shape's rule-12
        # checkpoint is gone WITH its second consumer (the vocab cut
        # now re-derives from toks), so the hash stream pipelines
        # straight into the broadcast join + per-doc agg
    )
    train_bi = toks.filter("is_train").select(
        F.explode(
            F.expr(
                """
                if(size(t) >= 2,
                   transform(sequence(1, size(t) - 1),
                             i -> struct(
                                 element_at(t, i) AS w1,
                                 element_at(t, i + 1) AS w2,
                                 concat(element_at(t, i), ' ',
                                        element_at(t, i + 1)) AS bg)),
                   cast(array() as
                        array<struct<w1: string, w2: string, bg: string>>))
                """
            )
        ).alias("p")
    )
    uni = (
        toks.filter("is_train")
        .select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
        # v scalar + class-join consumers; vocabulary-sized
        .localCheckpoint(eager=False)
    )
    v = uni.agg(F.count(F.lit(1)).cast("long").alias("v_uni"))
    vocab = (
        train_bi.select(
            F.xxhash64("p.w1", "p.w2").alias("bgh"), "p.w1", "p.bg"
        )
        .groupBy("bgh")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c12"),
            F.min("bg").alias("bg"),
            F.min("w1").alias("w1"),
        )
        .orderBy(F.desc("c12"), "bg")
        .limit(_PPL_V)
    )
    classes = (
        uni.withColumnRenamed("w", "w1")
        .join(F.broadcast(vocab), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "bgh",
            F.expr(
                _dsir_class_case("(c12 + 1)", "(c1 + v_uni)", clamp=_PPL_CLAMP)
            ).alias("cls"),
        )
    )
    scored = (
        bi.join(F.broadcast(classes), "bgh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bi"),
            F.sum(F.when(F.col("cls").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.coalesce("cls", F.lit(-_PPL_CLAMP)))
            .cast("long")
            .alias("score"),
        )
    )
    rate = (
        F.when(F.col("bucket") == "head", _CCNET_RATES["head"])
        .when(F.col("bucket") == "middle", _CCNET_RATES["middle"])
        .otherwise(_CCNET_RATES["tail"])
        .cast("long")
    )
    return (
        scored.withColumn(
            "bucket", F.expr(_ppl_bucket_sql("score", "n_bi"))
        )
        .withColumn("rate_permille", rate)
        .select(
            "doc_id",
            "n_bi",
            "n_oov",
            "score",
            "bucket",
            "rate_permille",
            (_bucket("doc_id", 1000) < F.col("rate_permille")).alias("kept"),
        )
        .orderBy("doc_id")
    )


def ppl_train_model(docs: DataFrame, target_pred) -> dict[str, int]:
    """Train the bigram-LM perplexity MODEL as a servable artifact:
    {bigram -> floor-log2 class} for the top-{_PPL_V} training-slice
    bigrams (out-of-vocabulary bigrams take the -{_PPL_CLAMP} backoff
    class at serving time). The model is V small integers keyed by
    string — exactly what a serving tier ships
    (streaming/curation.perplexity_stream compiles it into the plan as
    a map literal; the batch gate keeps its own fused plan so its
    oracle hash is unchanged)."""
    toks = docs.select(
        target_pred.alias("is_train"), F.expr(_TOKENS).alias("t")
    ).localCheckpoint(eager=False)  # bigram + unigram consumers
    bi = toks.filter("is_train").select(
        F.explode(
            F.expr(
                """
                if(size(t) >= 2,
                   transform(sequence(1, size(t) - 1),
                             i -> struct(
                                 element_at(t, i) AS w1,
                                 concat(element_at(t, i), ' ',
                                        element_at(t, i + 1)) AS bg)),
                   cast(array() as array<struct<w1: string, bg: string>>))
                """
            )
        ).alias("p")
    ).select("p.w1", "p.bg")
    uni = (
        toks.filter("is_train")
        .select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
        .localCheckpoint(eager=False)  # v scalar + class-join consumers
    )
    v = uni.agg(F.count(F.lit(1)).cast("long").alias("v_uni"))
    vocab = (
        bi.groupBy("bg", "w1")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .orderBy(F.desc("c12"), "bg")
        .limit(_PPL_V)
    )
    rows = (
        uni.withColumnRenamed("w", "w1")
        .join(F.broadcast(vocab), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "bg",
            F.expr(
                _dsir_class_case("(c12 + 1)", "(c1 + v_uni)", clamp=_PPL_CLAMP)
            ).alias("cls"),
        )
        .collect()
    )
    return {r["bg"]: int(r["cls"]) for r in rows}


# ---------------------------------------------------------------------------
# schema-evolution read (S-family): a layer whose drops evolved —
# later batches carry columns earlier batches lack — read back as ONE
# frame with mergeSchema, missing columns null-backfilled.
# ---------------------------------------------------------------------------


@register(
    "schema_evolution_roundtrip",
    """
    SELECT CASE WHEN doc_id % 2 = 0 THEN '<pre-evolution>'
                ELSE 'lang:' || COALESCE(lang, '<null>') END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY 1
    ORDER BY bucket
    """,
)
def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents split into two parquet generations — v1 drops carry
    (doc_id, text, n_chars); v2 drops additionally carry (lang,
    schema_v) — read back as ONE frame with ``mergeSchema``, then
    aggregated per bucket, v1 rows identified by their null-backfilled
    schema_v. The ordering-independent roundtrip device
    (jsonl_roundtrip): the ORACLE recomputes the aggregates from the
    pristine documents view and the %2 split constant — DuckDB never
    reads the exported files, so a dropped row, a mis-backfilled
    column, or a generation read with the wrong schema fails the hash.

    Scale shape: schema merge is a FOOTER operation (one task per file
    footer at planning time), the data scan stays columnar and narrow;
    null backfill costs nothing (absent column chunks simply aren't
    read).
    """
    import os

    docs = spread(load_table(spark, sf_dir, "documents"))
    d = _jsonl_gate_dir(sf_dir).replace("jsonl", "schev")
    evolved = os.path.join(d, "evolved")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text", "n_chars"
    )
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        "text",
        "n_chars",
        "lang",
        F.lit(2).alias("schema_v"),
    )
    v1.write.mode("overwrite").parquet(evolved)
    v2.write.mode("append").parquet(evolved)
    back = spark.read.option("mergeSchema", "true").parquet(evolved)
    return (
        back.select(
            F.when(F.col("schema_v").isNull(), "<pre-evolution>")
            .otherwise(F.concat(F.lit("lang:"), F.coalesce("lang", F.lit("<null>"))))
            .alias("bucket"),
            "n_chars",
            "doc_id",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# URL canonicalization + dedup (crawl-ingest family)
# ---------------------------------------------------------------------------

# Engine-shared synthesis: every 4 consecutive doc_ids are the SAME
# logical page in a different disguise (scheme/host case, www. prefix,
# default port, utm_*/fbclid tracking params, param order, fragment) —
# the variant axes a real Common-Crawl URL deduper must collapse.
# Pages where page % 11 = 0 sit on a NON-default port (:8080) in every
# variant, pinning that canonicalization keeps real ports while
# stripping default ones. Pure ||/CASE/CAST text, identical in Spark
# and DuckDB.
_URL_PAGE_SQL = "CAST(floor(doc_id / 4) AS BIGINT)"
_URL_SQL = f"""
    CASE doc_id % 4
      WHEN 0 THEN __scheme || '://www.ex' || __dom || '.com' || __xport
                  || __path || '?id=' || __pg
      WHEN 1 THEN upper(__scheme) || '://EX' || __dom || '.COM'
                  || (CASE WHEN __xport <> '' THEN __xport
                           ELSE __defport END)
                  || __path || '?utm_source=feed&id=' || __pg || '#top'
      WHEN 2 THEN __scheme || '://ex' || __dom || '.com' || __xport
                  || __path || '?id=' || __pg || '&utm_campaign=x'
      ELSE        __scheme || '://WwW.ex' || __dom || '.com' || __xport
                  || __path || '?fbclid=xyz&id=' || __pg
    END
"""
# the per-page pieces the CASE above references
_URL_PIECES_SQL = {
    "__pg": f"CAST({_URL_PAGE_SQL} AS STRING)",
    "__dom": f"CAST({_URL_PAGE_SQL} % 7 AS STRING)",
    "__scheme": f"CASE WHEN {_URL_PAGE_SQL} % 3 = 0 THEN 'https' ELSE 'http' END",
    "__defport": f"CASE WHEN {_URL_PAGE_SQL} % 3 = 0 THEN ':443' ELSE ':80' END",
    "__xport": f"CASE WHEN {_URL_PAGE_SQL} % 11 = 0 THEN ':8080' ELSE '' END",
    "__path": f"'/p/' || CAST({_URL_PAGE_SQL} AS STRING)",
}


def _url_synth_sql() -> str:
    """The synthesized URL as one self-contained SQL expression (the
    __pieces inlined), shared verbatim by both engines."""
    sql = _URL_SQL
    for k, v in _URL_PIECES_SQL.items():
        sql = sql.replace(k, f"({v})")
    return sql


def canonical_url_columns(urls: DataFrame) -> DataFrame:
    """(url, canonical_url): crawl-style URL canonicalization —
    lowercase scheme+host, strip a leading 'www.', strip the fragment,
    strip DEFAULT ports only (:80 http / :443 https), drop utm_* and
    fbclid tracking params, sort the survivors. Narrow projection;
    patterns go through the Column API, never a SQL string literal
    (rule 4). ``urls`` needs a string column ``url``.

    Parsing is try_parse_url: an unparseable URL yields a NULL
    canonical (concat is null-propagating) instead of killing the
    scan — a crawl frontier receives garbage by definition, and
    parse_url THROWS on it in Spark 4 (review r7 s5). Tracking-param
    matching is startswith, not LIKE: LIKE's `_` is a single-char
    wildcard, so 'utm_%' would also strip legitimate 'utm=1'/'utmX=…'
    params and conflate distinct URLs (review r7 s5)."""
    scheme = F.lower(F.try_parse_url("url", F.lit("PROTOCOL")))
    auth = F.try_parse_url("url", F.lit("AUTHORITY"))
    host = F.regexp_replace(
        F.lower(F.regexp_replace(auth, F.lit(r":[0-9]+$"), F.lit(""))),
        F.lit(r"^www\."),
        F.lit(""),
    )
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    path = F.try_parse_url("url", F.lit("PATH"))
    query = F.coalesce(F.try_parse_url("url", F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: ~(
                p.startswith("utm_")
                | p.startswith("fbclid=")
                | (p == F.lit("fbclid"))
            )
            & (p != ""),
        )
    )
    qq = F.array_join(kept, "&")
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when((port != "") & ~default_port, F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
        path,
        F.when(qq != "", F.concat(F.lit("?"), qq)).otherwise(F.lit("")),
    )
    return urls.withColumn("canonical_url", canon)


@register(
    "url_canonical_dedup",
    f"""
    WITH urls AS (
        SELECT doc_id, {_url_synth_sql()} AS url FROM documents
    ),
    parsed AS (
        SELECT doc_id, url,
               lower(regexp_extract(url, '^([a-zA-Z]+)://', 1)) AS scheme,
               regexp_extract(url, '^[a-zA-Z]+://([^/?#]*)', 1) AS auth,
               regexp_extract(url, '^[a-zA-Z]+://[^/?#]*([^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS query
        FROM urls
    ),
    hp AS (
        SELECT doc_id, scheme, path, query,
               regexp_replace(
                   lower(regexp_replace(auth, ':[0-9]+$', '')),
                   '^www\\.', '') AS host,
               regexp_extract(auth, ':([0-9]+)$', 1) AS port
        FROM parsed
    ),
    q AS (
        SELECT doc_id, scheme, host, port, path,
               array_to_string(list_sort(list_filter(
                   string_split(query, '&'),
                   p -> NOT (starts_with(p, 'utm_')
                             OR starts_with(p, 'fbclid=')
                             OR p = 'fbclid')
                        AND p <> '')), '&') AS qq
        FROM hp
    ),
    canon AS (
        SELECT doc_id,
               scheme || '://' || host ||
               CASE WHEN port <> ''
                         AND NOT ((scheme = 'http' AND port = '80')
                                  OR (scheme = 'https' AND port = '443'))
                    THEN ':' || port ELSE '' END ||
               path ||
               CASE WHEN qq <> '' THEN '?' || qq ELSE '' END AS canonical_url
        FROM q
    )
    SELECT canonical_url,
           COUNT(*)        AS n_variants,
           MIN(doc_id)     AS keeper_doc_id
    FROM canon
    GROUP BY 1
    ORDER BY 1
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL dedup: canonicalize, group, keep the min doc_id.

    The step every Common-Crawl-scale pipeline runs before fetching or
    re-processing a page twice. URLs are synthesized in-plan from
    doc_id (engine-shared SQL text — 4 disguises per logical page:
    case, www., default port, tracking params, param order, fragment),
    canonicalized by canonical_url_columns (Spark parse_url; the
    oracle re-derives the same algebra with regexps), and collapsed by
    canonical string. Scale shape: narrow parse projection + ONE
    shuffle on the canonical hash key — identical to exact_dedup.
    Reference analogue: none (net-new crawl-ingest op).
    """
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.expr(_url_synth_sql()).alias("url")
    )
    canon = canonical_url_columns(docs)
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .orderBy("canonical_url")
    )


# ---------------------------------------------------------------------------
# XML ingest round trip (oracle gate for the S18 source path)
# ---------------------------------------------------------------------------

_XML_MALFORMED = (
    "<doc><doc_id>900000000</doc_id><text>truncated",
    "this line is not xml at all",
    # a type-failed field corrupts the whole row under from_xml
    # (probed — unlike from_csv's per-field NULL)
    "<doc><doc_id>abc</doc_id><text>bad id type</text></doc>",
)
_XML_MISSING_ID = "<doc><text>orphan, no id</text><lang>vi</lang></doc>"
_XML_MISSING_TEXT = "<doc><doc_id>900000001</doc_id><lang>vi</lang></doc>"
# a VALID injected line whose text round-trips through entity escapes;
# raw text 'a &<tag> b' = 10 chars, declared n_chars 12 on purpose so
# the two lengths cannot be conflated
_XML_ENTITY_LINE = (
    "<doc><doc_id>900000002</doc_id><text>a &amp;&lt;tag&gt; b</text>"
    "<lang>xx</lang><source>inj</source><n_chars>12</n_chars></doc>"
)


@register(
    "xml_roundtrip",
    """
    SELECT 'lang:' || COALESCE(lang, '<null>') AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(len(text)) AS BIGINT) AS tchars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY lang
    UNION ALL
    SELECT 'lang:xx', CAST(1 AS BIGINT), CAST(12 AS BIGINT),
           CAST(10 AS BIGINT), CAST(900000002 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:malformed_xml', CAST(3 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:doc_id', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:text', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    ORDER BY bucket
    """,
)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → line-framed XML → ``read_xml_docs`` → aggregates,
    with injected garbage that must land in quarantine and one valid
    entity-escaped line that must decode — the S18 source path pinned
    end to end against the pristine parquet table (the jsonl_roundtrip
    oracle device: DuckDB never reads the files, so corruption, drops,
    duplication, mis-quarantine, or a broken entity decode all fail
    the value hash). text-length AND id sums ride along so an escaping
    bug cannot hide behind the carried n_chars.
    """
    import os

    from ..sources.xml_source import format_doc_xml, read_xml_docs

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "xml")
    docs_src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    format_doc_xml(docs_src).write.mode("overwrite").text(out)
    with open(os.path.join(out, "zz_injected.xml"), "w") as f:
        for line in (
            *_XML_MALFORMED,
            _XML_MISSING_ID,
            _XML_MISSING_TEXT,
            _XML_ENTITY_LINE,
        ):
            f.write(line + "\n")
    docs, quar = read_xml_docs(spark, out)
    by_lang = docs.groupBy(
        F.concat(F.lit("lang:"), F.coalesce("lang", F.lit("<null>"))).alias(
            "bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.length("text")).alias("tchars"),
        F.sum("doc_id").alias("id_sum"),
    )
    by_reason = (
        quar.groupBy(
            F.concat(F.lit("quarantine:"), F.col("reason")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            "n",
            F.lit(0).cast("long").alias("chars"),
            F.lit(0).cast("long").alias("tchars"),
            F.lit(0).cast("long").alias("id_sum"),
        )
    )
    return by_lang.unionByName(by_reason).orderBy("bucket")


# ---------------------------------------------------------------------------
# cross-source vocabulary overlap matrix (corpus-audit family)
# ---------------------------------------------------------------------------


@register(
    "source_overlap_matrix",
    f"""
    WITH toks AS (
        SELECT source, unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    st AS (SELECT DISTINCT source, token FROM toks),
    sizes AS (SELECT source, COUNT(*) AS v FROM st GROUP BY 1),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_common
        FROM st a JOIN st b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           sa.v AS v_a, sb.v AS v_b, i.n_common,
           CAST((1000000 * i.n_common)
                // (sa.v + sb.v - i.n_common) AS BIGINT) AS jaccard_ppm
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    ORDER BY 1, 2
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between corpus sources: |V_a|,
    |V_b|, |V_a ∩ V_b|, and Jaccard as an integer ppm floor division —
    the dataset-audit matrix a curation team reads before mixing
    sources (near-identical vocabularies → redundant source; tiny
    overlap → domain shift).

    Shape (r12 opt, guide §2.4 — the _cooccur_pairs device): ONE
    grouped pass on the 64-bit token hash (rule 13 — strings never
    shuffle) collects each token's distinct source set (bounded by
    |sources|, so the buffer can never blow up), in-row ordered pairs
    replace the old distinct + token-keyed string self-join (two
    exchanges + a join fewer; matched-session A/B 1.32 → 1.11 s at
    sf0.1, identical rows). Sizes ride the same grouped frame. A
    64-bit token-hash collision would merge two vocabulary entries —
    the accepted _shingle_key risk class, and the oracle (which joins
    raw strings) fails loudly on it. (ADVICE r12 production
    self-check recipe: one pass of countDistinct(token) vs
    countDistinct(xxhash64(token)) on a new corpus quantifies the
    collision exposure before trusting the matrix.)
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(F.expr(_TOKENS)).alias("token")
    )
    grouped = (
        toks.select(F.xxhash64("token").alias("tk"), "source")
        .groupBy("tk")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .localCheckpoint(eager=False)  # sizes + pairs consumers
    )
    sizes = (
        grouped.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    inter = (
        grouped.filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(ss) - 2), i -> "
                    "transform(sequence(i + 1, size(ss) - 1), j -> "
                    "struct(ss[i] AS source_a, ss[j] AS source_b))))"
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("v").alias("v_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("v").alias("v_b")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "v_a",
            "v_b",
            "n_common",
            F.expr(
                "CAST((1000000 * n_common) div (v_a + v_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# vocabulary growth / novelty-rate audit (Heaps-law curve per batch)
# ---------------------------------------------------------------------------

_VOCAB_DAYS = 30


@register(
    "vocab_growth_daily",
    f"""
    WITH toks AS (
        SELECT doc_id % {_VOCAB_DAYS} AS day,
               unnest({_SQL_TOKENS}) AS token
        FROM documents
    ),
    dt AS (SELECT DISTINCT day, token FROM toks),
    first_seen AS (SELECT token, MIN(day) AS d0 FROM dt GROUP BY 1),
    per_day AS (SELECT day, COUNT(*) AS n_distinct FROM dt GROUP BY 1),
    new_per_day AS (SELECT d0 AS day, COUNT(*) AS n_new
                    FROM first_seen GROUP BY 1),
    joined AS (
        SELECT p.day, p.n_distinct, COALESCE(n.n_new, 0) AS n_new
        FROM per_day p LEFT JOIN new_per_day n ON n.day = p.day
    )
    SELECT day, n_distinct, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab,
           CAST((1000000 * n_new) // n_distinct AS BIGINT) AS novelty_ppm
    FROM joined
    ORDER BY day
    """,
)
def vocab_growth_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth across ingest batches: per batch (day =
    doc_id % 30, the in-plan synthesis device), the number
    of distinct tokens seen, how many were NEVER seen in an earlier
    batch, the cumulative vocabulary, and the novelty rate in ppm —
    the Heaps-law audit that tells a crawl operator when new data
    stops adding new language (and a dedup operator when it should).

    Shape: one (day, token) distinct with map-side combine feeds both
    the token-keyed first-seen min and the day-keyed distinct counts;
    everything after runs on days-sized frames (the global running sum
    included — the documented matrix-size exception).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        (F.col("doc_id") % _VOCAB_DAYS).alias("day"),
        F.explode(F.expr(_TOKENS)).alias("token"),
    )
    dt = toks.distinct().localCheckpoint(eager=False)  # 2 consumers
    first_seen = dt.groupBy("token").agg(F.min("day").alias("d0"))
    per_day = dt.groupBy("day").agg(F.count(F.lit(1)).alias("n_distinct"))
    new_per_day = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    joined = per_day.join(new_per_day, "day", "left").select(
        "day",
        "n_distinct",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "day",
        "n_distinct",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_vocab"),
        F.expr("CAST((1000000 * n_new) div n_distinct AS BIGINT)").alias(
            "novelty_ppm"
        ),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# generic HTML main-content extraction (boilerplate removal) — the
# crawl-to-corpus front door (sources/html_extract.py), oracle-gated
# ---------------------------------------------------------------------------
#
# Pages are synthesized IN-PLAN from each document's pristine text:
# the body is the doc's tokens chunked into 8-word <p> paragraphs,
# wrapped in a full chrome battery that exercises every extractor
# rule — tag pruning (<nav>, <footer>, <script>, <style>, <head>),
# class/id boilerplate pruning (class="header-menu", id="ad-banner"),
# the link-density drop (a 7-word <p> with 6 anchor words), the
# min-words drop (a 2-word <p>), and a KEPT block containing a link
# (9 words, 1 anchor word — pins that links alone don't drop a
# block). The oracle recomputes the kept text closed-form from the
# pristine parquet tokens + the injection constants and NEVER parses
# HTML — any extractor defect (mis-pruned chrome, wrong block
# segmentation, word-order loss, density off-by-one) breaks the md5.
#
# Scale shape: page synthesis is a narrow JVM-side projection; the
# extractor is one stateless Arrow-batched mapInPandas (one page =
# one row, no shuffle); the only exchange is the presentation sort.

_HX_CHUNK = 8
_HX_KEPT_CONST = "alpha beta gamma delta epsilon zeta eta theta iota"
# chrome around the body — every element here must be dropped by the
# extractor; the kept-with-link <p> is the one survivor
_HX_PREFIX = (
    "<html><head><title>Doc</title><script>var x = 1;</script>"
    "<style>p { color: red }</style></head><body>"
    '<nav><a href="/">Home</a> <a href="/jobs">Jobs</a></nav>'
    '<div class="header-menu"><a href="/login">Login</a>'
    ' <a href="/signup">Sign up</a></div>'
    "<p>alpha beta gamma delta epsilon zeta eta theta"
    ' <a href="/ref">iota</a></p>'
)
_HX_SUFFIX = (
    '<p><a href="/promo">click here for great deals now</a> buy</p>'
    "<p>too short</p>"
    '<div id="ad-banner">Buy now cheap deals today friend</div>'
    "<footer>Copyright 2026 All rights reserved forever</footer>"
    "</body></html>"
)


@register(
    "html_main_content",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id, ci,
               list_slice(t, ci * {_HX_CHUNK} + 1,
                          ci * {_HX_CHUNK} + {_HX_CHUNK}) AS ch
        FROM toks,
             UNNEST(generate_series(0, (len(t) + {_HX_CHUNK} - 1)
                                       // {_HX_CHUNK} - 1)) AS u(ci)
    ),
    kept AS (
        SELECT doc_id, ci, array_to_string(ch, ' ') AS btext,
               len(ch) AS nw
        FROM chunks WHERE len(ch) >= 5
    ),
    agg AS (
        SELECT doc_id,
               string_agg(btext, chr(10) ORDER BY ci) AS body,
               COUNT(*) AS nb,
               CAST(SUM(nw) AS BIGINT) AS nwords
        FROM kept GROUP BY doc_id
    ),
    dims AS (
        SELECT t.doc_id,
               len(t.t) % {_HX_CHUNK} AS rem,
               a.body, a.nb, a.nwords
        FROM toks t LEFT JOIN agg a USING (doc_id)
    )
    SELECT doc_id,
           CAST(1 + COALESCE(nb, 0) AS BIGINT) AS n_blocks_kept,
           CAST(2 + CASE WHEN rem BETWEEN 1 AND 4 THEN 1 ELSE 0 END
                AS BIGINT) AS n_blocks_dropped,
           CAST(9 + COALESCE(nwords, 0) AS BIGINT) AS n_words_kept,
           md5(CASE WHEN body IS NULL THEN '{_HX_KEPT_CONST}'
                    ELSE '{_HX_KEPT_CONST}' || chr(10) || body
               END) AS content_md5
    FROM dims
    ORDER BY doc_id
    """,
)
def html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL boilerplate removal end-to-end: synthesize a chrome-heavy
    page around each document's text in-plan, run the generic
    main-content extractor (sources/html_extract.py) at the Arrow
    edge, and pin kept-block counts + the extracted-text md5 against
    the oracle's closed-form recomputation from the pristine tokens
    (the png_decode_stats device — the oracle never parses HTML)."""
    from ..sources.html_extract import extract_main_text

    docs = spread(load_table(spark, sf_dir, "documents"))
    body = F.expr(
        "array_join(transform("
        f"  sequence(0, (size(t) - 1) div {_HX_CHUNK}),"
        "  ci -> concat('<p>',"
        f"    array_join(slice(t, ci * {_HX_CHUNK} + 1, {_HX_CHUNK}), ' '),"
        "    '</p>')), '')"
    )
    # The synthesized body splices RAW corpus tokens between <p> tags:
    # a token containing an HTML metacharacter would make the parser
    # and the closed-form oracle diverge on data, not code. Enforce
    # the precondition in-plan (review r8) — a future testdata vocab
    # with '<'/'&'/'>' fails loudly instead of hash-mismatching.
    # NULL-aware predicate (ADVICE r8): rlike(NULL) is NULL and
    # assert_true treats non-true as failure — without the IS NOT NULL
    # conjunct a corpus with NULL text would fail with the misleading
    # metacharacter message instead of naming the actual violation.
    guard = F.coalesce(
        F.assert_true(
            F.col("text").isNotNull() & ~F.col("text").rlike("[<>&]"),
            F.lit(
                "html_main_content: document text is NULL or contains "
                "an HTML metacharacter — the unescaped page synthesis "
                "would diverge from the closed-form oracle; drop NULL "
                "docs / entity-escape the body build before re-enabling "
                "this corpus"
            ),
        ).cast("string"),
        F.lit(""),
    )
    pages = docs.select(
        "doc_id",
        F.expr(_TOKENS).alias("t"),
        guard.alias("__g"),
    ).select(
        "doc_id",
        # every doc has >= 1 token at every SF, but guard the
        # sequence(0, -1) COUNTS-DOWN trap anyway (CLAUDE.md rule 4)
        F.when(F.size("t") == 0, F.lit(_HX_PREFIX + _HX_SUFFIX))
        .otherwise(
            F.concat(F.lit(_HX_PREFIX), F.col("__g"), body,
                     F.lit(_HX_SUFFIX))
        )
        .alias("html"),
    )
    out = extract_main_text(pages)
    n_words = F.size(
        F.filter(
            F.split(F.regexp_replace("text", "\n", " "), " "),
            lambda x: x != "",
        )
    )
    # boundary below the presentation sort (r12 opt — see
    # plans.presentation_sort; the Arrow-edge extraction otherwise
    # runs twice under the range sampling pass)
    return presentation_sort(
        out.select(
            "doc_id",
            F.col("n_blocks_kept").cast("long").alias("n_blocks_kept"),
            F.col("n_blocks_dropped")
            .cast("long")
            .alias("n_blocks_dropped"),
            n_words.cast("long").alias("n_words_kept"),
            F.md5("text").alias("content_md5"),
        ),
        "doc_id",
    )


# ---------------------------------------------------------------------------
# Markdown main-content extraction (r9) — the code/docs-corpus sibling
# of html_main_content (sources/markdown_extract.py), oracle-gated
# ---------------------------------------------------------------------------
#
# Same device as the HTML gate: a Markdown document is synthesized
# IN-PLAN around each document's pristine tokens — an ATX heading, an
# image, a fenced code block (must be DROPPED), a constant line
# exercising link / bold / italic / inline-code rules, the body as
# 8-word bullet-list lines, and a trailing blockquote. The oracle
# recomputes the extracted text closed-form from the pristine parquet
# tokens + the injection constants and NEVER parses Markdown — a
# mis-ordered rule (italic pairing bold's delimiters, link-before-
# image leaving alt text), a fence leak, or a marker left behind
# breaks the md5.
#
# Unlike HTML, the extractor is a PURE JVM-side regexp chain (no
# Arrow edge): fully narrow, whole-stage-codegen, zero Python — the
# only exchange in the gate is the presentation sort.

_MDX_CHUNK = 8
_MDX_TITLE = "Alpha Beta Gamma"
_MDX_INLINE_SRC = (
    "See [the docs](https://example.com/docs) for **bold** and "
    "*italic* and `inline code` here."
)
_MDX_INLINE_OUT = "See the docs for bold and italic and inline code here."
_MDX_QUOTE = "quoted trailing words here"
_MDX_PREFIX = (
    f"# {_MDX_TITLE}\n\n"
    "![logo](https://example.com/logo.png)\n\n"
    "```\nsecret code line one\nsecret code line two\n```\n\n"
    f"{_MDX_INLINE_SRC}\n\n"
)
_MDX_SUFFIX = f"\n> {_MDX_QUOTE}\n"
# title (3) + inline line (11) + quote (4) constant kept words
_MDX_CONST_WORDS = 18


@register(
    "markdown_extract_stats",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id, ci,
               array_to_string(
                   list_slice(t, ci * {_MDX_CHUNK} + 1,
                              ci * {_MDX_CHUNK} + {_MDX_CHUNK}),
                   ' ') AS line
        FROM toks,
             UNNEST(generate_series(0, (len(t) + {_MDX_CHUNK} - 1)
                                       // {_MDX_CHUNK} - 1)) AS u(ci)
    ),
    body AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY ci) AS b,
               CAST(COUNT(*) AS BIGINT) AS nc
        FROM chunks GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(3 + COALESCE(b.nc, 0) AS BIGINT) AS n_lines_kept,
           CAST({_MDX_CONST_WORDS} + len(t.t) AS BIGINT) AS n_words_kept,
           md5('{_MDX_TITLE}' || chr(10) || '{_MDX_INLINE_OUT}'
               || chr(10) || COALESCE(b.b || chr(10), '')
               || '{_MDX_QUOTE}') AS content_md5
    FROM toks t LEFT JOIN body b ON t.doc_id = b.doc_id
    ORDER BY t.doc_id
    """,
)
def markdown_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Markdown extraction end-to-end: synthesize a markup-heavy
    document around each doc's text in-plan, run the in-plan regexp
    extractor (sources/markdown_extract.py), and pin kept-line/word
    counts + the extracted-text md5 against the oracle's closed-form
    recomputation from the pristine tokens (the html_main_content
    device — the oracle never parses Markdown)."""
    from ..sources.markdown_extract import extract_markdown_text

    docs = spread(load_table(spark, sf_dir, "documents"))
    body = F.expr(
        "array_join(transform("
        f"  sequence(0, (size(t) - 1) div {_MDX_CHUNK}),"
        "  ci -> concat('- ',"
        f"    array_join(slice(t, ci * {_MDX_CHUNK} + 1, {_MDX_CHUNK}),"
        "      ' '), '\\n')), '')"
    )
    # tokens are spliced RAW into bullet lines: a token containing a
    # Markdown metacharacter would make the extractor and the
    # closed-form oracle diverge on data, not code (the html gate's
    # precondition discipline; NULL-aware per ADVICE r8). Guarded: the
    # inline-rule alphabet, '>' (NOT inert — a chunk-START '>' token
    # is exposed at line start once the bullet rule strips '- ' and
    # the LATER blockquote rule eats it; '#' is safe because headings
    # strip BEFORE bullets, and a leading '-' token is
    # strip-identity), and control whitespace (an embedded newline/CR
    # breaks the line framing itself). Found by review (r9 session).
    guard = F.coalesce(
        F.assert_true(
            F.col("text").isNotNull()
            & ~F.col("text").rlike("[`*\\[\\]()>\t\n\r]"),
            F.lit(
                "markdown_extract_stats: document text is NULL or "
                "contains a Markdown inline metacharacter — the raw "
                "token splice would diverge from the closed-form "
                "oracle; escape the body build before re-enabling "
                "this corpus"
            ),
        ).cast("string"),
        F.lit(""),
    )
    pages = docs.select(
        "doc_id",
        F.expr(_TOKENS).alias("t"),
        guard.alias("__g"),
    ).select(
        "doc_id",
        F.when(F.size("t") == 0, F.lit(_MDX_PREFIX + _MDX_SUFFIX))
        .otherwise(
            F.concat(
                F.lit(_MDX_PREFIX), F.col("__g"), body, F.lit(_MDX_SUFFIX)
            )
        )
        .alias("markdown"),
    )
    out = extract_markdown_text(pages)
    n_words = F.size(
        F.filter(
            F.split(F.regexp_replace("text", "\n", " "), " "),
            lambda x: x != "",
        )
    )
    # boundary below the presentation sort (r12 opt — see
    # plans.presentation_sort; the regexp extraction chain otherwise
    # runs twice under the range sampling pass)
    return presentation_sort(
        out.select(
            "doc_id",
            F.size(F.split("text", "\n"))
            .cast("long")
            .alias("n_lines_kept"),
            n_words.cast("long").alias("n_words_kept"),
            F.md5("text").alias("content_md5"),
        ),
        "doc_id",
    )


# ---------------------------------------------------------------------------
# fixed-width source round trip (S20, sources/fwf_source.py) — the
# mainframe/ERP interchange, same oracle device as csv_roundtrip
# ---------------------------------------------------------------------------

# injected garbage, each exactly one quarantine class; widths must
# total fwf_line_width(DOC_FWF_LAYOUT) = 42 except the short line
_FWF_INJECTED = (
    ("SHORT LINE", "wrong length"),  # malformed_fwf (length)
    (
        "  abcdefghij" + "en".ljust(8) + "inj".ljust(12) + "7".rjust(10),
        "letters in the doc_id field",  # malformed_fwf (type fail)
    ),
    (
        " " * 12 + "en".ljust(8) + "inj".ljust(12) + "7".rjust(10),
        "blank required doc_id",  # missing:doc_id
    ),
    (
        "900000001".rjust(12) + " " * 8 + "inj".ljust(12) + "7".rjust(10),
        "blank required lang",  # missing:lang
    ),
)


@register(
    "fwf_roundtrip",
    """
    SELECT 'lang:' || lang AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY lang
    UNION ALL
    SELECT 'quarantine:malformed_fwf', CAST(2 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:doc_id', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'quarantine:missing:lang', CAST(1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    ORDER BY bucket
    """,
)
def fwf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document metadata → fixed-width text files (the in-plan
    overflow-guarded writer) → ``read_fwf_docs`` → aggregates, with
    injected garbage lines that must land in quarantine (one
    wrong-length line, one type failure inside a correctly-sized
    line, one blank required id, one blank required lang) — the S20
    source path pinned end to end against the pristine parquet table
    (the csv_roundtrip oracle device: DuckDB never reads the exported
    files). Per-lang counts + n_chars + doc-id sums reappearing
    exactly pins both the writer's column positions and the reader's
    slices — a one-column misalignment shifts every numeric and
    breaks the hash.
    """
    import os

    from ..sources.fwf_source import format_fwf_lines, read_fwf_docs

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "fwf")
    docs_src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    format_fwf_lines(docs_src).write.mode("overwrite").text(out)
    with open(os.path.join(out, "zz_injected.txt"), "w") as f:
        for line, _why in _FWF_INJECTED:
            f.write(line + "\n")
    rows, quar = read_fwf_docs(spark, out)
    by_lang = rows.groupBy(
        F.concat(F.lit("lang:"), F.col("lang")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum("doc_id").alias("id_sum"),
    )
    by_reason = (
        quar.groupBy(
            F.concat(F.lit("quarantine:"), F.col("reason")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            "n",
            F.lit(0).cast("long").alias("chars"),
            F.lit(0).cast("long").alias("id_sum"),
        )
    )
    return by_lang.unionByName(by_reason).orderBy("bucket")


# ---------------------------------------------------------------------------
# homoglyph (confusable) skeleton dedup (r9) — the spam/abuse dedup:
# a spoofer swaps Latin letters for Cyrillic/Greek lookalikes and the
# byte-level exact dedup goes blind. Unicode TR39 skeleton semantics
# on a pinned confusable subset: fold confusables to their Latin
# skeleton, lower-case, dedup keep-min on the skeleton.
# ---------------------------------------------------------------------------
#
# ONE shared table drives every artifact: the Spark translate() pair,
# the in-plan spoof synthesis (the REVERSE translation), and the
# oracle's generated replace() chain — the three cannot desynchronize.
# Confusables are embedded as literal UTF-8 (never chr()/char() —
# Spark char(N) is ASCII-modulo, CLAUDE.md r7 lesson); all chosen
# codepoints are NFC-stable single codepoints, byte-pinned by a unit
# test.

# (latin, confusable) — Cyrillic а е о р с у х і ѕ + Greek ο
_CONFUSABLES: tuple[tuple[str, str], ...] = (
    ("a", "а"),
    ("e", "е"),
    ("o", "о"),
    ("p", "р"),
    ("c", "с"),
    ("y", "у"),
    ("x", "х"),
    ("i", "і"),
    ("s", "ѕ"),
    ("o", "ο"),  # Greek omicron folds to the same skeleton letter
)
_SKEL_SRC = "".join(c for _, c in _CONFUSABLES)
_SKEL_DST = "".join(l for l, _ in _CONFUSABLES)
# spoof synthesis translates latin -> confusable; translate() maps
# each source char ONCE and dict() resolves duplicate keys LAST-wins,
# so the synthesized 'o' spoof is the GREEK omicron (the later
# entry) — the Cyrillic-о fold row is skeleton-only coverage on this
# ASCII corpus (no synthesized clone exercises it; both engines'
# spoof builders share the same dict, so they cannot disagree).
# Review r9: do not "fix" the order without updating both comments —
# reordering flips which confusable the spoof corpus exercises.
_SPOOF_SRC = "".join(dict((l, c) for l, c in _CONFUSABLES))
_SPOOF_DST = "".join(dict((l, c) for l, c in _CONFUSABLES).values())
_SPOOF_MOD = 9  # doc_id % 9 == 0 docs get a spoofed clone at +1000000


def _skel_sql(col: str) -> str:
    """DuckDB skeleton: the same fold as F.translate, generated from
    the shared confusable table as a replace() chain."""
    out = col
    for latin, conf in _CONFUSABLES:
        out = f"replace({out}, '{conf}', '{latin}')"
    return f"lower({out})"


def _spoof_sql(col: str) -> str:
    """DuckDB spoof synthesis: latin -> confusable, mirroring the
    Spark-side reverse translation."""
    out = col
    for latin, conf in dict(_CONFUSABLES).items():
        out = f"replace({out}, '{latin}', '{conf}')"
    return out


@register(
    "homoglyph_skeleton_dedup",
    f"""
    WITH unioned AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, {_spoof_sql('text')}
        FROM documents WHERE doc_id % {_SPOOF_MOD} = 0
    ),
    skel AS (
        SELECT doc_id, md5({_skel_sql('text')}) AS sk FROM unioned
    ),
    groups AS (
        SELECT sk, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS group_n
        FROM skel GROUP BY sk
    )
    SELECT doc_id, group_n,
           CASE WHEN group_n > 1 THEN 1 ELSE 0 END AS spoofed
    FROM groups
    ORDER BY doc_id
    """,
)
def homoglyph_skeleton_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-min dedup on the homoglyph SKELETON (confusables folded to
    Latin + lowercase): spoofed clones — synthesized in-plan by the
    REVERSE translation on doc_id % {_SPOOF_MOD} == 0 docs — collapse
    onto their originals (group_n = 2, spoofed = 1) while byte-level
    distinct docs survive untouched. Output = kept docs with their
    skeleton-group size.

    Shape: the skeleton is one narrow translate+lower+md5 projection
    (the skeleton string itself never shuffles — grouping is on its
    md5, the _shingle_key discipline); one hash agg on the skeleton
    key. Both engines' fold AND the spoof synthesis generate from the
    single _CONFUSABLES table."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    spoofs = docs.filter(F.col("doc_id") % _SPOOF_MOD == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.translate("text", _SPOOF_SRC, _SPOOF_DST).alias("text"),
    )
    unioned = docs.select("doc_id", "text").unionByName(spoofs)
    skel = unioned.select(
        "doc_id",
        F.md5(
            F.lower(F.translate("text", _SKEL_SRC, _SKEL_DST)).cast("binary")
        ).alias("sk"),
    )
    return (
        skel.groupBy("sk")
        .agg(
            F.min("doc_id").cast("long").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("group_n"),
        )
        .select(
            "doc_id",
            "group_n",
            F.when(F.col("group_n") > 1, 1).otherwise(0).alias("spoofed"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# license detection (r9) — the code-corpus curation staple (The Stack
# / StarCoder pipelines route files by detected license before
# training): classify each document by the license header it carries.
# ---------------------------------------------------------------------------
#
# Detector semantics (ScanCode-style, reduced to the integer core):
# per reference license, a set of DISTINCTIVE marker words; a document
# matches a license iff >= 80% of that license's markers appear among
# the document's FIRST {_LIC_HEAD} tokens (licenses live in headers —
# scanning the whole file would false-positive on quoted notices).
# The threshold is the usual integer cross-multiplication
# (5·hits >= 4·|set|), coverage is exact ppm.
#
# Headers are synthesized in-plan by doc_id residue (%4: none/mit/
# apache/gpl) with DISJOINT marker sets, and the corpus vocabulary is
# verifiably marker-free (31 distinct tokens, checked) — so the
# oracle labels closed-form from the residue alone and ANY spurious
# hit of the detector on natural text (a specificity defect) breaks
# the hash, exactly like a missed header (a recall defect).

_LIC_HEAD = 50
_LIC_SETS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("mit", ("permission", "hereby", "granted", "sublicense",
             "noninfringement")),
    ("apache", ("licensed", "apache", "compliance", "governing",
                "permissions")),
    ("gpl", ("gnu", "general", "public", "license", "foundation")),
)


@register(
    "license_detect",
    f"""
    SELECT CASE doc_id % 4 WHEN 1 THEN 'mit' WHEN 2 THEN 'apache'
                           WHEN 3 THEN 'gpl' ELSE 'none' END AS license,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(CASE WHEN doc_id % 4 = 0 THEN 0
                         ELSE 1000000 END) AS BIGINT) AS coverage_ppm_sum
    FROM documents
    GROUP BY 1
    ORDER BY 1
    """,
)
def license_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-license document counts from the header-marker detector
    (see block comment): docs get a license header prepended in-plan
    by residue class, the detector re-derives the label from the
    first {_LIC_HEAD} tokens only, and the oracle labels closed-form
    from the residue — spurious hits and missed headers both break
    the hash. Injected headers carry 100% marker coverage, so the
    exact-ppm coverage sum is pinned too.

    Shape: fully in-row (slice + array_intersect per license against
    a literal marker array, the threshold as a CASE ladder); the only
    shuffle is the 4-row final agg."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    headers = F.expr(
        "CASE CAST(doc_id % 4 AS INT) "
        + " ".join(
            f"WHEN {i + 1} THEN '{' '.join(words)} '"
            for i, (_, words) in enumerate(_LIC_SETS)
        )
        + " ELSE '' END"
    )
    docs = docs.select(
        "doc_id", F.concat(headers, F.col("text")).alias("text")
    )
    return (
        license_label_rows(docs)
        .groupBy("license")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum("coverage_ppm").cast("long").alias("coverage_ppm_sum"),
        )
        .orderBy("license")
    )

def license_label_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, license, coverage_ppm): the per-document header-marker
    classification — the stateless narrow transform shared by the
    batch gate and streaming.curation.license_stream. ``docs`` needs
    (doc_id, text); documents WITHOUT a recognized header label
    'none' with coverage 0."""
    head = F.slice(F.expr(_TOKENS), 1, _LIC_HEAD)
    hits = [
        F.size(
            F.array_intersect(head, F.array(*[F.lit(w) for w in words]))
        ).alias(f"__h_{name}")
        for name, words in _LIC_SETS
    ]
    scored = docs.select("doc_id", *hits)
    label = F.lit("none")
    coverage = F.lit(0).cast("long")
    for name, words in reversed(_LIC_SETS):
        n_set = len(words)
        hit = F.col(f"__h_{name}")
        matched = (F.lit(5) * hit) >= (F.lit(4) * F.lit(n_set))
        label = F.when(matched, F.lit(name)).otherwise(label)
        coverage = F.when(
            matched, (hit * 1000000 / F.lit(n_set)).cast("long")
        ).otherwise(coverage)
    return scored.select(
        "doc_id", label.alias("license"), coverage.alias("coverage_ppm")
    )


# ---------------------------------------------------------------------------
# readability scoring (r9): Flesch reading ease in exact integer
# milli-points — the edu-quality filter signal (phi-style "textbook"
# pipelines gate on readability bands).
# ---------------------------------------------------------------------------
#
# FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/word),
# scale-cleared to milli-points with each ratio as ONE positive floor
# division (identical text both engines):
#   FRE_m = 206835 − (1015·W) div S − (84600·Y) div W
# Sentences are synthesized at a fixed 12 tokens (the corpus has no
# punctuation): S = ceil(W/12). Syllables = vowel-GROUP count
# ('[aeiouy]+' runs, parity-checked Spark regexp_extract_all vs
# DuckDB — same count on the shared battery), the standard cheap
# approximation.

_FRE_SENT = 12
_FRE_BANDS = (
    (90000, "very_easy"),
    (60000, "standard"),
    (30000, "difficult"),
)


def _fre_bucket_sql(score: str) -> str:
    parts = [
        f"WHEN {score} >= {cut} THEN '{name}'" for cut, name in _FRE_BANDS
    ]
    return "CASE " + " ".join(parts) + " ELSE 'very_confusing' END"


@register(
    "readability_buckets",
    f"""
    WITH stats AS (
        SELECT doc_id,
               CAST(len({_SQL_TOKENS}) AS BIGINT) AS w,
               CAST(len(regexp_extract_all(text, '[aeiouy]+'))
                    AS BIGINT) AS y
        FROM documents
    ),
    scored AS (
        SELECT doc_id, w, y,
               (w + {_FRE_SENT - 1}) // {_FRE_SENT} AS s,
               206835 - (1015 * w) // ((w + {_FRE_SENT - 1})
                                       // {_FRE_SENT})
                      - (84600 * y) // w AS fre_m
        FROM stats
    )
    SELECT {_fre_bucket_sql('fre_m')} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(fre_m) AS BIGINT) AS fre_m_sum,
           CAST(SUM(y) AS BIGINT) AS syllable_sum
    FROM scored
    GROUP BY 1
    ORDER BY 1
    """,
)
def readability_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-reading-ease bands over the corpus in exact integer
    milli-points (see block comment): per band, doc counts, id and
    score sums, and the syllable mass — every number bit-stable, no
    float ratio anywhere.

    Shape: fully narrow per-doc scoring (token size + one regex run
    count + two floor divisions), then a 4-row band agg."""
    toks_n = F.size(F.expr(_TOKENS)).cast("long")
    syll = F.size(
        F.regexp_extract_all("text", F.lit("[aeiouy]+"), F.lit(0))
    ).cast("long")
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", toks_n.alias("w"), syll.alias("y")
    )
    scored = docs.select(
        "doc_id",
        "w",
        "y",
        F.expr(
            f"206835 - (1015 * w) div ((w + {_FRE_SENT - 1}) "
            f"div {_FRE_SENT}) - (84600 * y) div w"
        ).alias("fre_m"),
    )
    return (
        scored.select(
            "doc_id",
            "y",
            "fre_m",
            F.expr(_fre_bucket_sql("fre_m")).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum("fre_m").cast("long").alias("fre_m_sum"),
            F.sum("y").cast("long").alias("syllable_sum"),
        )
        .orderBy("bucket")
    )


def calibration_scored(docs: DataFrame) -> DataFrame:
    """(conf, y) per doc — the shared confidence/label projection
    (checkpoint-free narrow, so the streaming twin runs it verbatim):
    conf = clamp(5e5 + 1e4·logit, 0, 1e6), y = the independent
    distinct-token-ratio label."""
    return classifier_score(docs).select(
        F.expr(
            "least(1000000L, greatest(0L, 500000 + 10000 * logit))"
        ).alias("conf"),
        F.when(
            3 * F.col("n_distinct") >= 2 * F.col("n_tok"), 1
        ).otherwise(0).alias("y"),
    )


def calibration_buckets(docs: DataFrame) -> DataFrame:
    """(bucket, n, conf_sum, n_pos) — ONE aggregation over the scored
    projection, shared by the batch gate and calibration_stream (a
    stream cannot chain a second aggregation, so the summary/ECE fold
    stays batch-side / consumer-side)."""
    return calibration_scored(docs).groupBy(
        F.least(F.lit(9), F.expr("conf div 100000")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conf").cast("long").alias("conf_sum"),
        F.sum("y").cast("long").alias("n_pos"),
    )


# ---------------------------------------------------------------------------
# classifier calibration (ML-eval family, r10): the reliability
# diagram + expected calibration error every model-gated curation
# pipeline should run — "when the quality model says 70%, is it right
# 70% of the time?". Confidence = the linear classifier's logit
# clamped into ppm (conf = clamp(5e5 + 1e4·logit, 0, 1e6) — the
# integer stand-in for a sigmoid; a real model would quantize its
# probabilities the same way), ground truth = an INDEPENDENT quality
# property (distinct-token ratio ≥ 2/3, cross-multiplied — correlated
# with the model through n_distinct but not identical, so buckets
# carry real disagreement). Ten decile buckets; per bucket the gap
# |Σconf − 1e6·n_pos| div n, and one summary row with
# ECE = Σ_b |Σconf_b − 1e6·pos_b| div N — every emitted number a
# positive BIGINT floor division.
# ---------------------------------------------------------------------------


@register(
    "calibration_ece",
    f"""
    WITH f AS (
        SELECT doc_id,
               len({_SQL_TOKENS}) AS n_tok,
               len(list_distinct({_SQL_TOKENS})) AS n_distinct,
               len(list_filter({_SQL_TOKENS}, x -> x IN {_STOP_SQL}))
                   AS n_stop,
               len(list_filter({_SQL_TOKENS}, x -> length(x) <= 2))
                   AS n_short
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               least(1000000, greatest(0,
                   500000 + 10000 * ({_W_DISTINCT} * n_distinct
                       + {_W_STOP} * n_stop + {_W_TOK} * n_tok
                       + {_W_SHORT} * n_short))) AS conf,
               CASE WHEN 3 * n_distinct >= 2 * n_tok THEN 1 ELSE 0 END
                   AS y
        FROM f WHERE n_tok > 0
    ),
    b AS (
        SELECT least(9, conf // 100000) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conf) AS BIGINT) AS conf_sum,
               CAST(SUM(y) AS BIGINT) AS n_pos
        FROM scored GROUP BY 1
    ),
    per_bucket AS (
        SELECT CAST(bucket AS BIGINT) AS bucket, n,
               CAST(conf_sum // n AS BIGINT) AS avg_conf_ppm,
               CAST((1000000 * n_pos) // n AS BIGINT) AS acc_ppm,
               CAST(abs(conf_sum - 1000000 * n_pos) // n AS BIGINT)
                   AS gap_ppm
        FROM b
    ),
    summary AS (
        SELECT CAST(-1 AS BIGINT) AS bucket,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(conf_sum) // SUM(n) AS BIGINT) AS avg_conf_ppm,
               CAST((1000000 * SUM(n_pos)) // SUM(n) AS BIGINT)
                   AS acc_ppm,
               CAST(SUM(abs(conf_sum - 1000000 * n_pos)) // SUM(n)
                    AS BIGINT) AS gap_ppm
        FROM b
    )
    SELECT * FROM per_bucket
    UNION ALL SELECT * FROM summary
    ORDER BY bucket
    """,
)
def calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability buckets + expected calibration error for the
    quality classifier against an independent quality label (see block
    comment): per decile bucket (n, avg confidence, empirical accuracy,
    gap) in exact ppm, plus the bucket=-1 summary row whose gap_ppm IS
    the ECE.

    Shape: one corpus scan through the shared classifier features, a
    ≤10-row bucket aggregate, and a one-row rollup."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    b = calibration_buckets(docs).localCheckpoint(
        eager=False
    )  # per-bucket rows + the summary
    per_bucket = b.select(
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        F.expr("conf_sum div n").cast("long").alias("avg_conf_ppm"),
        F.expr("(1000000 * n_pos) div n").cast("long").alias("acc_ppm"),
        F.expr("abs(conf_sum - 1000000 * n_pos) div n")
        .cast("long")
        .alias("gap_ppm"),
    )
    summary = b.agg(
        F.sum("n").cast("long").alias("n"),
        F.expr("sum(conf_sum) div sum(n)")
        .cast("long")
        .alias("avg_conf_ppm"),
        F.expr("(1000000 * sum(n_pos)) div sum(n)")
        .cast("long")
        .alias("acc_ppm"),
        F.expr("sum(abs(conf_sum - 1000000 * n_pos)) div sum(n)")
        .cast("long")
        .alias("gap_ppm"),
    ).select(
        F.lit(-1).cast("long").alias("bucket"),
        "n",
        "avg_conf_ppm",
        "acc_ppm",
        "gap_ppm",
    )
    return per_bucket.unionByName(summary).orderBy("bucket")


# ---------------------------------------------------------------------------
# MBOX ingest round trip (S21, r10): the email-corpus source — the
# jsonl/warc roundtrip device applied to the mbox framing (From
# envelopes, >From stuffing, RFC-822 headers, UTF-8 8bit bodies) with
# the avro-style ROW-level quarantine: two injected messages missing
# required headers plus one non-mbox file must land in quarantine
# (counted in the bucket = -1 row) without disturbing a single good
# message's bytes. The oracle recomputes buckets from the pristine
# parquet view + the literal injection constants — DuckDB never reads
# a mailbox byte.
# ---------------------------------------------------------------------------

_MBOX_N_BAD = 3  # 2 missing-header messages + 1 bad container


@register(
    "mbox_roundtrip",
    f"""
    SELECT doc_id % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(length(text)) AS BIGINT) AS chars
    FROM documents GROUP BY 1
    UNION ALL
    SELECT -1, {_MBOX_N_BAD}, 0, 0
    ORDER BY 1
    """,
)
def mbox_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → distributed mbox export → ``read_mbox_messages`` →
    aggregates + quarantine count: the S21 source pinned end to end
    (see block comment). Doc ids ride Message-ID (<doc-N@corpus>);
    chars pins that the stuffing/framing round trip preserves every
    body byte; the bucket = -1 row pins that exactly the injected
    garbage quarantined (a spurious quarantine or a silently swallowed
    message both break the hash)."""
    import os
    import shutil

    from ..sources.mbox_source import (
        mbox_docs,
        mbox_quarantine,
        read_mbox_messages,
        write_mbox_archive,
    )

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "mbox")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    msgs = docs.select(
        F.concat(F.lit("<doc-"), F.col("doc_id"), F.lit("@corpus>")).alias(
            "msg_id"
        ),
        F.lit("corpus@example.com").alias("from_addr"),
        F.concat(F.lit("doc "), F.col("doc_id")).alias("subject"),
        F.col("text").alias("body"),
    ).repartition(8)
    write_mbox_archive(msgs, out).count()  # drain: executes the export
    # inject: one mailbox whose messages lack required headers, and
    # one file that is not an mbox at all
    date = "Thu, 01 Jan 2026 00:00:00 +0000"
    bad = (
        f"From z@x {date}\nFrom: z@x\nSubject: no-id\n\nbody one\n"
        f"\n"
        f"From z@x {date}\nMessage-ID: <bad@x>\nSubject: no-from\n\n"
        f"body two\n"
    ).encode("utf-8")
    with open(os.path.join(out, "part-injected.mbox"), "wb") as f:
        f.write(bad)
    with open(os.path.join(out, "part-garbage.mbox"), "wb") as f:
        f.write(b"this is not a mailbox at all")
    back = read_mbox_messages(spark, f"{out}/*").localCheckpoint(
        eager=False
    )  # docs + quarantine consumers
    parsed = mbox_docs(back).select(
        F.regexp_extract("msg_id", r"<doc-(\d+)@corpus>", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("body").alias("text"),
    )
    good = (
        parsed.groupBy((F.col("doc_id") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(F.length("text")).cast("long").alias("chars"),
        )
    )
    quar = mbox_quarantine(back).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).select(
        F.lit(-1).cast("long").alias("bucket"),
        "n_docs",
        F.lit(0).cast("long").alias("id_sum"),
        F.lit(0).cast("long").alias("chars"),
    )
    return good.unionByName(quar).orderBy("bucket")


# ---------------------------------------------------------------------------
# ZIP/TAR archive-container source round trip (S22, judge ask r10) —
# the code-corpus ingest shape (The Stack, GitHub dumps): many small
# files with meaningful member paths inside .zip / .tar.gz containers.
# ---------------------------------------------------------------------------
#
# Ordering-independent oracle device (the jsonl/mbox convention): the
# oracle recomputes the aggregates from the pristine parquet view plus
# the injection constants — DuckDB never reads the exported archives,
# so member loss, content corruption, a silent prefix of a truncated
# tar, or a mis-quarantined container all break the hash regardless of
# driver run order. The per-bucket char sum pins byte fidelity through
# all four codec combinations write_archive emits (zip/tar.gz ×
# plain/gzipped members); the -3 row pins that a corrupt ZIP member
# quarantines ALONE (its good sibling still lands — central-directory
# member granularity); -1/-2 pin exactly the injected failures (a
# spurious quarantine or a swallowed member both move a count).

_ARCH_NOTE = "injected note body: tiếng Việt có dấu"
_ARCH_N_BAD_ARCHIVE = 2  # garbage file + truncated tar (whole-file)
_ARCH_N_BAD_MEMBER = 1  # one corrupt-data ZIP member


@register(
    "archive_roundtrip",
    f"""
    SELECT doc_id % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(length(text)) AS BIGINT) AS chars
    FROM documents GROUP BY 1
    UNION ALL
    SELECT -1, {_ARCH_N_BAD_ARCHIVE}, 0, 0
    UNION ALL
    SELECT -2, {_ARCH_N_BAD_MEMBER}, 0, 0
    UNION ALL
    SELECT -3, 1, 0, {len(_ARCH_NOTE)}
    ORDER BY 1
    """,
)
def archive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → distributed ZIP/TAR.GZ export (one container per
    task, members named ``src/doc-<id>.txt``, half the partitions with
    per-member gzip) → ``read_archive_members`` → aggregates +
    quarantine counts: the S22 source pinned end to end (see block
    comment). Shape: one binaryFile scan fans member rows out of the
    Arrow batches; everything downstream is narrow aggregation."""
    import io
    import os
    import shutil
    import struct
    import tarfile
    import zipfile

    from ..sources.archive_source import (
        archive_quarantine,
        archive_text_docs,
        read_archive_members,
        write_archive,
    )

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "archive")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    members = docs.select(
        F.concat(
            F.lit("src/doc-"), F.col("doc_id"), F.lit(".txt")
        ).alias("member_path"),
        "text",
    ).repartition(8)
    # 8 pids cover all 4 codec combos: zip/tar.gz × plain/gz members
    write_archive(
        members, out, gzip_members_every_other=True
    ).count()  # drain: executes the export

    # injection 1: not an archive at all → one bad_archive row
    with open(os.path.join(out, "part-garbage.tar"), "wb") as f:
        f.write(b"this is not an archive container at all")
    # injection 2: a tar truncated mid-member — must quarantine WHOLE
    # (the no-silent-prefix contract), never yield its first member
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        for nm in ("t/a.txt", "t/b.txt"):
            info = tarfile.TarInfo(nm)
            info.size = 600
            tf.addfile(info, io.BytesIO(bytes(600)))
    with open(os.path.join(out, "part-trunc.tar"), "wb") as f:
        f.write(tbuf.getvalue()[: 512 + 300])
    # injection 3: a ZIP whose SECOND member's compressed bytes are
    # flipped — the good first member must still land (-3 row), the
    # corrupt one must quarantine alone (-2 row)
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("extra/injected-note.txt", _ARCH_NOTE)
        zf.writestr("extra/corrupt.bin", b"A" * 4096)
    raw = bytearray(zbuf.getvalue())
    with zipfile.ZipFile(io.BytesIO(bytes(raw))) as zf:
        info = zf.infolist()[1]
    name_n, extra_n = struct.unpack_from("<HH", raw, info.header_offset + 26)
    ds = info.header_offset + 30 + name_n + extra_n
    for i in range(ds, ds + min(8, info.compress_size)):
        raw[i] ^= 0xFF
    with open(os.path.join(out, "part-corrupt.zip"), "wb") as f:
        f.write(bytes(raw))

    back = read_archive_members(spark, f"{out}/*").localCheckpoint(
        eager=False
    )  # docs + note + quarantine consumers
    texts = archive_text_docs(back)
    good = (
        texts.filter(F.col("member_path").startswith("src/doc-"))
        .select(
            F.regexp_extract("member_path", r"doc-(\d+)\.txt", 1)
            .cast("long")
            .alias("doc_id"),
            "text",
        )
        .groupBy((F.col("doc_id") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(F.length("text")).cast("long").alias("chars"),
        )
    )
    note = texts.filter(
        F.col("member_path") == "extra/injected-note.txt"
    ).agg(
        F.lit(-3).cast("long").alias("bucket"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.lit(0).cast("long").alias("id_sum"),
        F.sum(F.length("text")).cast("long").alias("chars"),
    )
    quar = (
        archive_quarantine(back)
        .select(
            F.when(F.col("reason").startswith("bad_archive"), F.lit(-1))
            .when(F.col("reason").startswith("bad_member"), F.lit(-2))
            .otherwise(F.lit(-9))  # unexpected class → hash break
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            "bucket",
            "n_docs",
            F.lit(0).cast("long").alias("id_sum"),
            F.lit(0).cast("long").alias("chars"),
        )
    )
    return good.unionByName(note).unionByName(quar).orderBy("bucket")


# ---------------------------------------------------------------------------
# transaction-log table format (ACID snapshots / time travel / skipping)
# ---------------------------------------------------------------------------


@register(
    "txlog_snapshot_rollup",
    """
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
    ),
    latest AS (
        SELECT * FROM base
        WHERE NOT (o_orderkey % 3 IN (0, 1)
                   AND o_orderstatus = 'F' AND o_custkey % 10 = 3)
    ),
    v2 AS (SELECT * FROM base WHERE o_orderkey % 3 IN (0, 1))
    SELECT 'flag:orphan_vacuumed' AS scope, CAST(1 AS BIGINT) AS n,
           CAST(0 AS BIGINT) AS key_sum, CAST(0.0 AS DOUBLE) AS revenue
    UNION ALL
    SELECT 'flag:prune_skips', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
           CAST(0.0 AS DOUBLE)
    UNION ALL
    SELECT 'flag:txn_noop', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
           CAST(0.0 AS DOUBLE)
    UNION ALL
    SELECT 'latest', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(o_orderkey) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
    FROM latest
    UNION ALL
    SELECT 'pruned', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(o_orderkey) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
    FROM latest WHERE o_orderkey BETWEEN 100 AND 400
    UNION ALL
    SELECT 'v2', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(o_orderkey) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
    FROM v2
    UNION ALL
    SELECT 'v4', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(o_orderkey) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
    FROM latest
    ORDER BY scope
    """,
)
def txlog_snapshot_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-log table (txlog.LogTable — the published lakehouse
    commit protocol: JSON commit log over immutable parquet, os.link
    create-if-absent commits) pinned end to end: two range-partitioned
    appends, a copy-on-write DELETE, an IDEMPOTENT txn append whose
    replay must no-op, a value-preserving compaction, a log checkpoint
    (checkpoint_every=3, so every later read replays from it), a
    vacuum that removes exactly the planted orphan, and footer-stat
    data skipping.

    Scopes: ``latest`` (post-delete/append/compact state), ``v2``
    (time travel to before the delete), ``v4`` (pre-compaction —
    equal to latest, proving compaction preserved values), ``pruned``
    (a where_between read whose file list was stats-pruned; values
    must equal the plain filter), and three in-gate flags — skipping
    really skipped files, vacuum deleted exactly the orphan, the txn
    replay minted no version. The oracle recomputes every scope from
    the pristine orders table: delete applies only to rows resident
    at v3 (keys %3 in (0,1)); the %3=2 append is untouched by it.
    """
    import os as _os

    from ..txlog import LogTable

    out = _jsonl_gate_dir(sf_dir).replace("jsonl", "txlog")
    import shutil as _shutil

    _shutil.rmtree(out, ignore_errors=True)
    t = LogTable(
        spark, out, stats_cols=("o_orderkey",), checkpoint_every=3
    )
    # One materialization of the 4-column projection (r12 opt, rule
    # 12 family): each append otherwise scans the orders parquet twice
    # (repartitionByRange's range-sampling pass + the write) — three
    # appends = six scans off one small frame.
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .localCheckpoint()
    )

    def slice_mod3(r: int) -> DataFrame:
        return orders.filter(F.col("o_orderkey") % 3 == r).repartitionByRange(
            3, "o_orderkey"
        )

    t.append(slice_mod3(0))                       # v1
    t.append(slice_mod3(1))                       # v2
    t.delete_where(                               # v3 (+ checkpoint)
        "o_orderstatus = 'F' AND o_custkey % 10 = 3"
    )
    v4 = t.append(slice_mod3(2), txn=("gate", 1))  # v4
    t.append(slice_mod3(2), txn=("gate", 1))       # replay: must no-op
    flag_txn = 1 if t.latest_version() == v4 else 0
    kept, total = t.pruned_file_count(
        {"o_orderkey": (100, 400)}, version=v4
    )
    flag_prune = 1 if 0 < kept < total else 0
    t.compact(small_rows=10**9)                    # v5: values preserved
    with open(_os.path.join(out, "data", "zz-orphan.parquet"), "wb") as f:
        f.write(b"never committed")
    deleted = t.vacuum(retain_versions=99)
    flag_orphan = 1 if deleted == ["data/zz-orphan.parquet"] else 0

    def agg(df: DataFrame, scope: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
            F.sum(F.col("o_totalprice").cast("decimal(20,2)"))
            .cast("double")
            .alias("revenue"),
        ).select(F.lit(scope).alias("scope"), "n", "key_sum", "revenue")

    flags = spark.createDataFrame(
        [
            ("flag:orphan_vacuumed", flag_orphan, 0, 0.0),
            ("flag:prune_skips", flag_prune, 0, 0.0),
            ("flag:txn_noop", flag_txn, 0, 0.0),
        ],
        "scope string, n long, key_sum long, revenue double",
    )
    return (
        agg(t.read_snapshot(), "latest")
        .unionByName(
            agg(
                t.read_snapshot(where_between={"o_orderkey": (100, 400)}),
                "pruned",
            )
        )
        .unionByName(agg(t.read_snapshot(version=2), "v2"))
        .unionByName(agg(t.read_snapshot(version=v4), "v4"))
        .unionByName(flags)
        .orderBy("scope")
    )
