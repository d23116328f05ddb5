"""MBOX mailbox source (S21): the classic Unix mail archive format —
the shape email/Enron-style corpora ship in (one file, messages framed
by ``From `` envelope lines, bodies ``>From``-stuffed).

Same discipline as the WARC/Avro sources: a pure-stdlib codec (the
``email`` package parses each message; the mbox FRAMING is implemented
here — stdlib ``mailbox`` needs a filesystem path and per-message
random access, which doesn't fit the one-file-one-task Arrow batch
shape), one input file = one parse task via ``binaryFile`` +
``mapInPandas``, and ROW-level quarantine: a message missing its
required headers (Message-ID, From) or whose body cannot decode lands
in the output with a non-NULL ``reason`` instead of killing the task
or silently vanishing.

Framing rules implemented (the mboxrd convention):
- a message starts at a line beginning ``From `` (the envelope line,
  which is NOT a header and is dropped after capture);
- body lines that would start with ``From `` are written stuffed as
  ``>From `` and unstuffed on read (``>>From`` → ``>From`` etc. — the
  FULL mboxrd rule: one ``>`` is stripped from any ``>*From `` line,
  so stuffing round-trips at every depth);
- messages are separated by exactly one blank line (the writer
  guarantees it). The blank-line separator is PART of the accepted
  framing: a foreign mbox variant without it parses its messages as
  one concatenated body — the format's inherent ambiguity (an
  unstuffed body line starting ``From `` is indistinguishable from an
  envelope), resolved here the conservative way (never split inside
  what might be a body).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ._atomic import commit_file as _commit_file
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MBOX_SCHEMA = StructType(
    [
        StructField("source_file", StringType(), True),
        StructField("msg_index", LongType(), True),
        StructField("msg_id", StringType(), True),
        StructField("from_addr", StringType(), True),
        StructField("subject", StringType(), True),
        StructField("date_hdr", StringType(), True),
        StructField("body", StringType(), True),
        StructField("reason", StringType(), True),
    ]
)

_STUFF_RE = re.compile(r"^(>*)From ", re.M)


def _unstuff(body: str) -> str:
    return re.sub(r"^>(>*From )", r"\1", body, flags=re.M)


def _stuff(body: str) -> str:
    return _STUFF_RE.sub(r">\1From ", body)


def parse_mbox_bytes(name: str, content: bytes) -> list[dict]:
    """Every message of one mbox file as row dicts (pure function —
    shared by the Arrow batches and unit tests). Messages that parse
    but lack Message-ID / From quarantine with ``missing:<field>``;
    an undecodable body quarantines with ``bad_body``."""
    import email
    import email.policy

    rows: list[dict] = []
    if not content:
        return rows
    # normalize CRLF (some producers) then split on envelope lines
    text = content.replace(b"\r\n", b"\n")
    if text.startswith(b"From "):
        chunks = re.split(rb"\n\n(?=From )", text)
        # the split consumed each message's framing newline plus the
        # separator — restore the framing newline so every chunk ends
        # uniformly (the last one never lost it)
        chunks = [c + b"\n" for c in chunks[:-1]] + chunks[-1:]
    else:
        return [
            {
                "source_file": name,
                "msg_index": 0,
                "msg_id": None,
                "from_addr": None,
                "subject": None,
                "date_hdr": None,
                "body": None,
                "reason": "bad_container",
            }
        ]
    for idx, chunk in enumerate(chunks):
        row: dict = {
            "source_file": name,
            "msg_index": idx,
            "msg_id": None,
            "from_addr": None,
            "subject": None,
            "date_hdr": None,
            "body": None,
            "reason": None,
        }
        # drop the envelope line; the rest is an RFC-822 message
        nl = chunk.find(b"\n")
        payload = b"" if nl < 0 else chunk[nl + 1 :]
        try:
            msg = email.message_from_bytes(
                payload, policy=email.policy.default
            )
            row["msg_id"] = msg.get("Message-ID")
            row["from_addr"] = msg.get("From")
            row["subject"] = msg.get("Subject")
            row["date_hdr"] = msg.get("Date")
            part = msg.get_body(preferencelist=("plain",))
            body = part.get_content() if part is not None else None
            if body is not None:
                # the writer appends one newline per message; strip
                # exactly the framing newline, then unstuff
                if body.endswith("\n"):
                    body = body[:-1]
                row["body"] = _unstuff(body)
        except Exception as e:  # parse/decode failure → quarantine
            row["reason"] = f"bad_message:{type(e).__name__}"
            rows.append(row)
            continue
        missing = [
            f
            for f, v in (("msg_id", row["msg_id"]),
                         ("from_addr", row["from_addr"]))
            if v is None
        ]
        if missing:
            row["reason"] = f"missing:{missing[0]}"
        elif row["body"] is None:
            row["reason"] = "bad_body"
        rows.append(row)
    return rows


def _parse_mbox_batches(batches):
    import pandas as pd

    for pdf in batches:
        for name, content in zip(pdf["path"], pdf["content"]):
            rows = parse_mbox_bytes(name, bytes(content))
            if rows:
                yield pd.DataFrame(rows)


def read_mbox_messages(spark: SparkSession, path_glob: str) -> DataFrame:
    """(source_file, msg_index, msg_id, from_addr, subject, date_hdr,
    body, reason) for every message under ``path_glob`` — good rows
    carry ``reason`` NULL; quarantined rows carry the failure class
    (the csv/avro row-level quarantine contract). One file = one parse
    task."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    return files.mapInPandas(_parse_mbox_batches, schema=MBOX_SCHEMA)


def read_mbox_stream(
    spark: SparkSession,
    path_glob: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin (twin 49): newly landed mbox files replay
    through the SAME stateless parser — batch == stream file for
    file (the read_warc_stream shape)."""
    from pyspark.sql.types import TimestampType

    schema = StructType(
        [
            StructField("path", StringType(), True),
            StructField("modificationTime", TimestampType(), True),
            StructField("length", LongType(), True),
            StructField("content", BinaryType(), True),
        ]
    )
    reader = spark.readStream.format("binaryFile").schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path_glob).select("path", "content")
    return files.mapInPandas(_parse_mbox_batches, schema=MBOX_SCHEMA)


def mbox_docs(messages: DataFrame) -> DataFrame:
    """Good rows only, as (msg_id, subject, body)."""
    return messages.filter(F.col("reason").isNull()).select(
        "msg_id", "from_addr", "subject", "date_hdr", "body"
    )


def mbox_quarantine(messages: DataFrame) -> DataFrame:
    return messages.filter(F.col("reason").isNotNull()).select(
        "source_file", "msg_index", "reason"
    )


def write_mbox_archive(
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "msg_id",
    from_col: str = "from_addr",
    subject_col: str = "subject",
    body_col: str = "body",
    date: str = "Thu, 01 Jan 2026 00:00:00 +0000",
) -> DataFrame:
    """Export rows as mbox archives — one file per partition, messages
    framed with ``From `` envelopes, UTF-8 8bit bodies ``>From``-
    stuffed, tmp-write + ``os.rename`` per file (rule 17: a retried
    task can only leave a stale tmp, never a torn mailbox). Returns a
    (file, n_messages) report frame the caller drains to execute the
    write. Same shared-filesystem deployment constraint as
    write_warc_archive."""
    import os as _os
    import uuid as _uuid

    import pandas as pd
    from pyspark.sql.functions import spark_partition_id

    src = docs.select(
        F.col(id_col).cast("string").alias("mid"),
        F.col(from_col).cast("string").alias("frm"),
        F.col(subject_col).cast("string").alias("subj"),
        F.col(body_col).cast("string").alias("body"),
        spark_partition_id().alias("__pid"),
    )

    def write_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        chunks: list[bytes] = []
        n = 0
        pid = 0
        for pdf in batches:
            for mid, frm, subj, body, p in zip(
                pdf["mid"], pdf["frm"], pdf["subj"], pdf["body"],
                pdf["__pid"],
            ):
                pid = int(p)
                for field, v in (("msg_id", mid), ("from_addr", frm),
                                 ("subject", subj)):
                    if v is None:
                        continue
                    if "\n" in str(v) or "\r" in str(v):
                        raise ValueError(
                            f"mbox writer: {field} contains a line "
                            "break — unrepresentable in an RFC-822 "
                            "header (raise, never mutate)"
                        )
                    if not str(v).isascii():
                        # ADVICE r10: the reader's email parser
                        # decodes 8-bit header bytes via
                        # surrogateescape, so raw-UTF-8 header values
                        # mangle silently on round trip. RFC 2047
                        # encoding would need symmetric decode on the
                        # read side; until a gate pins that path,
                        # unrepresentable → raise, never mutate.
                        raise ValueError(
                            f"mbox writer: {field} contains non-ASCII "
                            "characters — RFC-822 headers are 7-bit; "
                            "RFC2047-encode upstream (raise, never "
                            "mutate)"
                        )
                body_s = "" if body is None else str(body)
                if "\r" in body_s:
                    raise ValueError(
                        "mbox writer: body contains CR — CRLF-"
                        "tolerant readers fold it away silently; "
                        "normalize line endings first (raise, never "
                        "mutate)"
                    )
                stuffed = _stuff(body_s)
                msg = (
                    f"From {frm} {date}\n"
                    f"Message-ID: {mid}\n"
                    f"From: {frm}\n"
                    f"Subject: {subj}\n"
                    f"Date: {date}\n"
                    "Content-Type: text/plain; charset=utf-8\n"
                    "Content-Transfer-Encoding: 8bit\n"
                    "MIME-Version: 1.0\n"
                    "\n"
                    f"{stuffed}\n"
                ).encode("utf-8")
                chunks.append(msg)
                n += 1
        if not n:
            return
        raw = b"\n".join(chunks)
        name = f"part-{pid:05d}.mbox"
        _commit_file(out_dir, name, raw)
        yield pd.DataFrame({"file": [name], "n_messages": [n]})

    return src.mapInPandas(
        write_partition, schema="file string, n_messages long"
    )
