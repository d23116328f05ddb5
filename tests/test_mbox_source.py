"""MBOX source (S21, sources/mbox_source.py): framing/stuffing codec
goldens, row-level quarantine classes, and the distributed write →
read round trip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.sources.mbox_source import (
    _stuff,
    _unstuff,
    mbox_docs,
    mbox_quarantine,
    parse_mbox_bytes,
    read_mbox_messages,
    write_mbox_archive,
)

_DATE = "Thu, 01 Jan 2026 00:00:00 +0000"


def _msg(i: int, body: str, *, drop: str | None = None) -> bytes:
    headers = [
        f"Message-ID: <m{i}@x>",
        f"From: a{i}@x",
        f"Subject: s{i}",
        f"Date: {_DATE}",
        "Content-Type: text/plain; charset=utf-8",
        "Content-Transfer-Encoding: 8bit",
        "MIME-Version: 1.0",
    ]
    if drop:
        headers = [h for h in headers if not h.startswith(drop)]
    return (
        f"From a{i}@x {_DATE}\n" + "\n".join(headers) + f"\n\n{body}\n"
    ).encode("utf-8")


def test_stuffing_rules_all_depths():
    """The mboxrd rule: stuff prepends one '>' to any >*From line,
    unstuff strips exactly one — round trips at every depth."""
    body = "From x\n>From y\n>>From z\nnot From\n From indented"
    assert _unstuff(_stuff(body)) == body
    assert _stuff(body).split("\n")[0] == ">From x"
    assert _stuff(body).split("\n")[2] == ">>>From z"
    # indented / mid-line 'From' untouched
    assert _stuff(body).split("\n")[4] == " From indented"


def test_parse_round_trip_tricky_bodies():
    bodies = [
        "hello world",
        "From the very start",
        "a\nFrom b\n>From c",
        "tiếng Việt có dấu",
        "trailing newline\n",
        "blank\n\ninside",
    ]
    raw = b"\n".join(_msg(i, _stuff(b)) for i, b in enumerate(bodies))
    rows = parse_mbox_bytes("t.mbox", raw)
    assert len(rows) == len(bodies)
    for i, r in enumerate(rows):
        assert r["reason"] is None
        assert r["body"] == bodies[i], i
        assert r["msg_id"] == f"<m{i}@x>"
        assert r["subject"] == f"s{i}"


def test_quarantine_classes():
    raw = b"\n".join(
        [
            _msg(0, "good"),
            _msg(1, "no id", drop="Message-ID"),
            _msg(2, "no from", drop="From:"),
        ]
    )
    rows = parse_mbox_bytes("t.mbox", raw)
    assert [r["reason"] for r in rows] == [
        None,
        "missing:msg_id",
        "missing:from_addr",
    ]
    assert parse_mbox_bytes("t.mbox", b"not a mailbox")[0]["reason"] == (
        "bad_container"
    )
    assert parse_mbox_bytes("t.mbox", b"") == []


def test_write_read_round_trip_spark(spark, tmp_path):
    out = str(tmp_path / "mbox")
    docs = spark.createDataFrame(
        [
            (f"<d{i}@x>", "me@x", f"subj {i}", f"body {i}\nFrom line {i}")
            for i in range(12)
        ],
        "msg_id string, from_addr string, subject string, body string",
    ).repartition(3)
    rep = write_mbox_archive(docs, out)
    assert rep.agg(F.sum("n_messages")).collect()[0][0] == 12
    files = [f for f in os.listdir(out) if f.endswith(".mbox")]
    assert len(files) == 3
    back = read_mbox_messages(spark, f"{out}/*")
    assert mbox_quarantine(back).count() == 0
    got = {
        (r.msg_id, r.subject, r.body)
        for r in mbox_docs(back).collect()
    }
    assert got == {
        (f"<d{i}@x>", f"subj {i}", f"body {i}\nFrom line {i}")
        for i in range(12)
    }


def test_writer_raises_on_unrepresentable_input(spark, tmp_path):
    """Review r10: a newline in any header would inject bogus headers
    or split the message (a subject with a blank line + 'From '
    round-tripped as TWO messages, losing the body); a CR in the body
    would be folded by the CRLF-tolerant reader. Both raise — the FWF
    writer discipline (unrepresentable → raise, never mutate)."""
    import pytest

    def run(rows):
        df = spark.createDataFrame(
            rows,
            "msg_id string, from_addr string, subject string, body string",
        )
        write_mbox_archive(df, str(tmp_path / "out")).count()

    with pytest.raises(Exception, match="line break"):
        run([("<a@x>", "me@x", "hi\n\nFrom x", "body")])
    with pytest.raises(Exception, match="line break"):
        run([("<a\n@x>", "me@x", "s", "body")])
    with pytest.raises(Exception, match="CR"):
        run([("<a@x>", "me@x", "s", "a\r\nb")])
