"""Fixed-width (FWF) corpus-metadata source: column-positioned rows →
typed rows with per-line quarantine. S20 in the quarantine-source
family (WARC / JSONL / CSV / ORC / XML / Avro / FWF).

Fixed-width is the mainframe/ERP interchange that still feeds real
warehouses: no delimiters, every field is a (start, width) slice,
numerics right-aligned, strings left-aligned, blanks are NULL. The
format carries fixed-size METADATA records (ids, codes, counters) —
variable-length document text does not fit the format and is not
pretended to (the writer raises on field overflow rather than
silently truncating).

Spark-first shape (the csv_source design with slicing in place of
``from_csv``): one splittable built-in ``text`` scan, then a pure
JVM-side projection — ``substring`` + ``trim`` + ``try_cast`` per
field, all inside whole-stage codegen. Every input line lands in
exactly ONE of (typed rows, quarantine):

- ``malformed_fwf``: the line length disagrees with the layout, or a
  numeric field is non-blank but fails its cast;
- ``missing:<field>``: a required field is blank (FWF's NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, width, type) in column order; type ∈ {"bigint", "string"}.
# Numerics are right-aligned space-padded, strings left-aligned.
DOC_FWF_LAYOUT: tuple[tuple[str, int, str], ...] = (
    ("doc_id", 12, "bigint"),
    ("lang", 8, "string"),
    ("source", 12, "string"),
    ("n_chars", 10, "bigint"),
)


def fwf_line_width(layout=DOC_FWF_LAYOUT) -> int:
    return sum(w for _, w, _ in layout)


def format_fwf_lines(
    df: DataFrame, layout=DOC_FWF_LAYOUT, out_col: str = "value"
) -> DataFrame:
    """(value): `df`'s rows rendered as fixed-width lines, ready for
    ``.write.text``. A value wider than its field or a NULL numeric
    would corrupt COLUMN POSITIONS for every later field — both raise
    in-plan (``assert_true``) instead of silently truncating; NULL
    strings render as all-blank (the format's NULL)."""
    parts: list[Column] = []
    for name, w, typ in layout:
        s = F.col(name).cast("string")
        if typ == "string":
            # a NULL string renders as all-blank. Raise on overflow,
            # on embedded CR/LF (they break the one-record-per-line
            # framing itself — the XML writer's r7 lesson), and on
            # leading/trailing spaces (indistinguishable from pad
            # spaces: the value would silently round-trip mutated,
            # violating the raise-instead-of-corrupt contract).
            ok = F.coalesce(
                (F.length(s) <= w)
                & ~s.rlike("[\r\n]")
                & (s == F.trim(s)),
                F.lit(True),
            )
            padded = F.rpad(F.coalesce(s, F.lit("")), w, " ")
            msg = (
                f"fwf writer: field '{name}' overflows width {w}, "
                "contains CR/LF, or has leading/trailing spaces — "
                "the value would not round-trip"
            )
        else:
            ok = s.isNotNull() & (F.length(s) <= w)
            padded = F.lpad(s, w, " ")
            msg = (
                f"fwf writer: field '{name}' overflows width {w} or is a "
                "NULL numeric — fixed-width positions would corrupt"
            )
        # assert_true yields NULL on success; concatenated as an
        # empty-string contribution it cannot be pruned (the
        # html_main_content guard device — an identical-branch when()
        # would constant-fold away)
        guard = F.coalesce(
            F.assert_true(ok, F.lit(msg)).cast("string"), F.lit("")
        )
        parts.append(F.concat(guard, padded))
    return df.select(F.concat(*parts).alias(out_col))


def _partition_fwf_lines(
    raw: DataFrame,
    layout,
    required_fields: tuple[str, ...],
) -> tuple[DataFrame, DataFrame]:
    """The stateless slice/partition shared by the batch and streaming
    readers: (line) → (typed rows, quarantine), both narrow
    projections of the one input frame."""
    total = fwf_line_width(layout)
    pos = 1
    vals: dict[str, Column] = {}
    type_fail = F.lit(False)
    for name, w, typ in layout:
        rawf = F.substring("line", pos, w)
        trimmed = F.trim(rawf)
        if typ == "bigint":
            # ONE slice expression feeds both the cast and the
            # type-fail predicate (review r9: a hand-rendered second
            # SQL copy of the slice could drift from `trimmed`)
            val = trimmed.try_cast("bigint")
            type_fail = type_fail | ((trimmed != "") & val.isNull())
        else:
            val = F.nullif(trimmed, F.lit(""))
        vals[name] = val.alias(name)
        pos += w
    reason = F.when(
        (F.length("line") != total) | type_fail, F.lit("malformed_fwf")
    )
    for fname in required_fields:
        reason = reason.when(
            vals[fname].isNull(), F.lit(f"missing:{fname}")
        )
    marked = raw.select(
        "line", reason.alias("reason"), *[vals[n] for n, _, _ in layout]
    )
    docs = marked.filter(F.col("reason").isNull()).drop("line", "reason")
    quarantine = marked.filter(F.col("reason").isNotNull()).select(
        "line", "reason"
    )
    return docs, quarantine


def read_fwf_docs(
    spark: SparkSession,
    path: str,
    layout=DOC_FWF_LAYOUT,
    required_fields: tuple[str, ...] = ("doc_id", "lang"),
) -> tuple[DataFrame, DataFrame]:
    """(rows, quarantine): typed metadata rows and the rejected lines
    (line, reason) — the two frames partition the input exactly
    (tested); both are narrow projections of one splittable text
    scan with every field decode inside whole-stage codegen."""
    raw = spark.read.text(path).select(F.col("value").alias("line"))
    return _partition_fwf_lines(raw, layout, required_fields)


def read_fwf_stream(
    spark: SparkSession,
    path: str,
    layout=DOC_FWF_LAYOUT,
    required_fields: tuple[str, ...] = ("doc_id", "lang"),
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of ``read_fwf_docs``: newly landed fixed-width
    dumps become micro-batches of (typed rows, quarantine) — the same
    stateless slice as the batch reader, so batch == stream row for
    row."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path).select(F.col("value").alias("line"))
    return _partition_fwf_lines(raw, layout, required_fields)
