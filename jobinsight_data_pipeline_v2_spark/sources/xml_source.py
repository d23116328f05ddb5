"""XML corpus source (S18): line-framed XML documents → typed rows
with corrupt-record quarantine.

Feed archives, sitemaps, and enterprise CMS exports ship as XML; the
line-framed variant (one self-contained ``<doc>…</doc>`` element per
line) is the splittable interchange shape — the XML sibling of JSONL.
The production contract matches the other text sources: every input
line lands in exactly ONE of (typed rows, quarantine), and a malformed
line can never kill a 100 TB read.

Spark-first shape: the built-in splittable ``text`` source scans the
lines; Spark 4's native ``from_xml`` parses each one as a codegen'd
narrow projection. Corruption detection rides the dedicated
corrupt-record column — from_xml flags unparseable lines AND rows with
a type-failed field there (probed: unlike from_csv, a bigint failure
corrupts the whole row), while a merely ABSENT element parses to a
NULL field and is policed by ``required_fields`` predicates. Both
output frames are lazy projections of ONE text scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .jsonl_source import DOC_SCHEMA


def xml_escape(col: Column) -> Column:
    """Escape &, <, > for XML text content (``&`` first, or the other
    entities' own ampersands would double-escape), plus CR/LF as
    numeric character references — a literal newline in a field would
    break the one-element-per-LINE framing contract and make the
    round trip silently lose the document (review r7 s5; from_xml
    decodes &#10;/&#13; back, probed)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    out = F.replace(out, F.lit("\r"), F.lit("&#13;"))
    return F.replace(out, F.lit("\n"), F.lit("&#10;"))


def format_doc_xml(docs: DataFrame, schema: StructType = DOC_SCHEMA) -> DataFrame:
    """One self-contained ``<doc>…</doc>`` element per row, as a
    single-column frame ready for the text writer. NULL fields omit
    their element (the reader's missing-field path), string fields are
    entity-escaped; the projection is fully narrow.

    Empty-string contract (PROBED, ADVICE r7): ``from_xml`` parses an
    empty element ``<text></text>`` to the EMPTY STRING, not NULL — a
    valid doc with empty text round-trips intact and never hits the
    ``missing:<field>`` quarantine path (only an OMITTED element does).
    Pinned by the empty-text row in the partition test."""
    parts: list[Column] = [F.lit("<doc>")]
    for field in schema.fields:
        val = F.col(field.name).cast("string")
        if isinstance(field.dataType, StringType):
            val = xml_escape(val)
        parts.append(
            F.coalesce(
                F.concat(
                    F.lit(f"<{field.name}>"), val, F.lit(f"</{field.name}>")
                ),
                F.lit(""),
            )
        )
    parts.append(F.lit("</doc>"))
    return docs.select(F.concat(*parts).alias("value"))


def _partition_xml_lines(
    raw: DataFrame, schema: StructType, required_fields: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """The stateless parse/partition shared by the batch and streaming
    readers: (line) → (typed docs, quarantine)."""
    corrupt = "_corrupt_record"
    schema_c = StructType(
        list(schema.fields) + [StructField(corrupt, StringType(), True)]
    )
    parsed = raw.select(
        "line",
        F.from_xml(
            "line", schema_c, {"columnNameOfCorruptRecord": corrupt}
        ).alias("doc"),
    )
    reason = F.when(
        F.col("doc").isNull() | F.col(f"doc.{corrupt}").isNotNull(),
        F.lit("malformed_xml"),
    )
    for fname in required_fields:
        reason = reason.when(
            F.col(f"doc.{fname}").isNull(), F.lit(f"missing:{fname}")
        )
    marked = parsed.select("line", "doc", reason.alias("reason"))
    docs = marked.filter(F.col("reason").isNull()).select("doc.*").drop(
        corrupt
    )
    quarantine = marked.filter(F.col("reason").isNotNull()).select(
        "line", "reason"
    )
    return docs, quarantine


def read_xml_docs(
    spark: SparkSession,
    path: str,
    schema: StructType = DOC_SCHEMA,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """(docs, quarantine): typed document rows and the rejected lines.

    ``docs`` has the schema's columns for every line that parsed AND
    carries all ``required_fields`` non-null. ``quarantine`` is
    (line, reason ∈ {'malformed_xml', 'missing:<field>'}) with the raw
    line kept for replay. The two frames partition the input exactly
    (tested); both are narrow projections of one splittable text scan.
    """
    raw = spark.read.text(path).select(F.col("value").alias("line"))
    return _partition_xml_lines(raw, schema, required_fields)


def read_xml_stream(
    spark: SparkSession,
    path: str,
    schema: StructType = DOC_SCHEMA,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of ``read_xml_docs``: newly landed XML dumps
    become micro-batches of (typed docs, quarantine). Same stateless
    parse as the batch reader, so batch == stream row for row; both
    frames feed the existing stateless twins directly."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.text(path).select(F.col("value").alias("line"))
    return _partition_xml_lines(raw, schema, required_fields)
