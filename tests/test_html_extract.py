"""Generic main-content extraction (sources/html_extract.py): golden
block decisions, word-order fidelity, the Spark transform's carry
contract, and the crawl→extract→curate integration the operator
exists for."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jobinsight_data_pipeline_v2_spark.sources.html_extract import (
    extract_blocks,
    extract_main_content,
    extract_main_text,
)

_PAGE = (
    "<html><head><title>T</title><script>var x = 1;</script>"
    "<style>p { color: red }</style></head><body>"
    '<nav><a href="/">Home</a> <a href="/jobs">Jobs</a></nav>'
    '<div class="header-menu"><a href="/l">Login</a> <a href="/s">Up</a></div>'
    "<p>alpha beta gamma delta epsilon zeta eta theta"
    ' <a href="/ref">iota</a></p>'
    "<p>one two three four five six</p>"
    '<p><a href="/promo">click here for great deals now</a> buy</p>'
    "<p>too short</p>"
    '<div id="ad-banner">Buy now cheap deals today friend</div>'
    "<footer>Copyright 2026 All rights reserved forever</footer>"
    "</body></html>"
)


def test_extract_golden_page():
    """The full chrome battery: tag pruning, class/id pruning, link
    density, min words — and kept blocks in document order."""
    text, n_kept, n_dropped = extract_main_content(_PAGE)
    assert text == (
        "alpha beta gamma delta epsilon zeta eta theta iota\n"
        "one two three four five six"
    )
    assert n_kept == 2
    # dropped = link-heavy p + too-short p (pruned chrome is never a
    # block, so it counts in neither bucket)
    assert n_dropped == 2


def test_extract_word_order_preserves_interleaving():
    """<p>a <a>b</a> c</p> must extract 'a b c' — the mini-DOM's flow
    list, not the texts-then-children order."""
    blocks = extract_blocks("<p>alpha <a href='#'>beta</a> gamma delta epsilon</p>")
    assert blocks[0]["text"] == "alpha beta gamma delta epsilon"
    assert blocks[0]["n_link_words"] == 1
    assert blocks[0]["kept"]


def test_extract_leaf_block_segmentation():
    """A div wrapping paragraphs is a container (its paragraphs are
    the blocks); a div with only inline content is itself a block;
    loose text directly in a container is not extracted (documented
    contract)."""
    html = (
        "<div>stray one two three four five"
        "<p>p1 p2 p3 p4 p5</p>"
        "<div>inline only block with six words</div>"
        "</div>"
    )
    blocks = extract_blocks(html)
    assert [b["text"] for b in blocks] == [
        "p1 p2 p3 p4 p5",
        "inline only block with six words",
    ]


def test_extract_boilerplate_word_boundaries():
    """'ad' prunes only at token boundaries: id='ad-banner' dies,
    class='addition-grid' survives."""
    html = (
        '<div id="ad-banner">one two three four five six</div>'
        '<div class="addition-grid">seven eight nine ten eleven twelve</div>'
    )
    blocks = extract_blocks(html)
    assert [b["text"] for b in blocks] == [
        "seven eight nine ten eleven twelve"
    ]


def test_extract_link_density_cross_multiplied():
    """Keep iff 3·link_words <= words: 2 of 6 kept, 3 of 6 dropped."""
    ok = extract_blocks("<p><a>a b</a> c d e f</p>")[0]
    assert ok["n_words"] == 6 and ok["n_link_words"] == 2 and ok["kept"]
    bad = extract_blocks("<p><a>a b c</a> d e f</p>")[0]
    assert bad["n_words"] == 6 and bad["n_link_words"] == 3 and not bad["kept"]


def test_extract_main_text_carries_columns(spark):
    """The Spark transform passes every non-html column through and
    replaces the page with (text, n_blocks_kept, n_blocks_dropped);
    a NULL page yields empty text, not a crash."""
    pages = spark.createDataFrame(
        [(1, "u1", _PAGE), (2, "u2", None)],
        "doc_id long, url string, html string",
    )
    out = extract_main_text(pages)
    assert out.columns == [
        "doc_id", "url", "text", "n_blocks_kept", "n_blocks_dropped",
    ]
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].url == "u1" and rows[1].n_blocks_kept == 2
    assert rows[1].text.startswith("alpha beta")
    assert rows[2].text == "" and rows[2].n_blocks_kept == 0


def test_crawl_extract_curate_matches_clean_text(spark, tmp_path):
    """The operator's reason to exist: a WARC crawl of chrome-heavy
    pages, extracted and curated, must produce byte-identical shards
    to curating the known clean text directly — boilerplate cannot
    leak into any curation decision."""
    from jobinsight_data_pipeline_v2_spark.corpus_pipeline import (
        curate_corpus,
    )
    from jobinsight_data_pipeline_v2_spark.sources.warc_source import (
        read_warc_records,
        warc_html_payloads,
        write_warc_archive,
    )

    # per-doc-unique tokens: no shared 16-gram (span dedup must not
    # cut), fully distinct (the quality classifier must keep)
    clean = [
        (i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(8)
    ]
    chrome = (
        '<nav><a href="/">Home</a> <a href="/x">X</a></nav>'
        '<div class="cookie-consent">We use cookies to improve things'
        " around here</div>"
    )
    pages = [
        (
            f"https://example.org/doc/{i}",
            f"<html><body>{chrome}<p>{t}</p>"
            f"<footer>Copyright 2026 example org rights</footer>"
            f"</body></html>",
        )
        for i, t in clean
    ]
    recs = spark.createDataFrame(
        pages, "target_uri string, payload string"
    ).repartition(2)
    arch = str(tmp_path / "arch")
    write_warc_archive(
        recs,
        arch,
        date="2026-02-01T00:00:00Z",
        http_content_type="text/html; charset=utf-8",
    ).count()
    raw = read_warc_records(spark, f"{arch}/*")
    # archived response records carry the http header envelope the
    # payload adapter strips
    extracted = extract_main_text(warc_html_payloads(raw)).select(
        F.expr("cast(substring(url, 25) as bigint)").alias("doc_id"),
        "text",
    )
    r_crawl = curate_corpus(
        spark, extracted, str(tmp_path / "shards_crawl"), n_shards=2
    )
    direct = spark.createDataFrame(clean, "doc_id long, text string")
    r_direct = curate_corpus(
        spark, direct, str(tmp_path / "shards_direct"), n_shards=2
    )
    assert r_crawl == {**r_direct, "out_dir": r_crawl["out_dir"]}
    a = spark.read.parquet(str(tmp_path / "shards_crawl"))
    b = spark.read.parquet(str(tmp_path / "shards_direct"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_extract_main_text_streaming_wiring(spark, tmp_path):
    """extract_main_text is stateless mapInPandas — the identical
    callable must run on a structured-streaming frame (the WARC
    replay front door's streaming twin)."""
    import os

    d = str(tmp_path / "pages")
    os.makedirs(d)
    pdf = spark.createDataFrame(
        [(1, _PAGE)], "doc_id long, html string"
    )
    pdf.write.parquet(d, mode="overwrite")
    stream = spark.readStream.schema(pdf.schema).parquet(d)
    out = extract_main_text(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("hx_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("select * from hx_stream").collect()
    assert len(got) == 1 and got[0].n_blocks_kept == 2
    assert got[0].text.startswith("alpha beta")


def test_extract_main_text_rejects_column_collisions(spark):
    """Pass-through columns named like the extractor's outputs raise
    up front instead of producing a duplicate-name schema."""
    pages = spark.createDataFrame(
        [(1, "old", "<p>a</p>")], "doc_id long, text string, html string"
    )
    with pytest.raises(ValueError, match="collide"):
        extract_main_text(pages)


def test_heading_rescue_smoothing():
    """keep_headings: a short heading directly above a kept paragraph
    is rescued (jusText near-good semantics); a heading above a
    DROPPED block, a link-heavy heading, and a trailing heading are
    not."""
    from jobinsight_data_pipeline_v2_spark.sources.html_extract import (
        rescue_headings,
    )

    html = (
        "<h2>Installation</h2>"
        "<p>run the installer with six words here</p>"
        "<h2>Dead section</h2>"
        "<p>too short</p>"
        '<h3><a href="/x">Linked heading</a></h3>'
        "<p>another kept paragraph of exactly seven words</p>"
        "<h2>Trailing heading</h2>"
    )
    text_off, k_off, _ = extract_main_content(html)
    assert text_off.startswith("run the installer")
    assert k_off == 2  # no headings without the option
    text_on, k_on, d_on = extract_main_content(html, keep_headings=True)
    assert text_on.split("\n")[0] == "Installation"
    assert "Dead section" not in text_on
    assert "Linked heading" not in text_on  # fails the link rule
    assert "Trailing heading" not in text_on  # nothing kept after it
    assert k_on == 3 and d_on == 4
    # rescue CASCADES through consecutive headings (h2 above a rescued
    # h3 above a kept paragraph — the reverse pass propagates
    # kept-ness, matching the h1/h2/paragraph nesting real pages have)
    blocks = rescue_headings(
        [
            {"tag": "h2", "text": "a", "n_words": 1, "n_link_words": 0,
             "kept": False},
            {"tag": "h3", "text": "b", "n_words": 1, "n_link_words": 0,
             "kept": False},
            {"tag": "p", "text": "c d e f g", "n_words": 5,
             "n_link_words": 0, "kept": True},
        ]
    )
    assert [b["kept"] for b in blocks] == [True, True, True]
