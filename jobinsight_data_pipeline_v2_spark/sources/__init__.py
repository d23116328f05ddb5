"""Out-of-engine data sources (SURVEY S1/S2 edge).

The crawler itself stays out-of-engine by design; this package holds
the HTML→rows parse edge (html_source) that turns captured page blobs
into RAW_JOBS rows inside Spark, and the WARC archive source
(warc_source) that replays Common-Crawl-style web archives through the
same pipeline.
"""

from .html_extract import (  # noqa: F401
    extract_main_content,
    extract_main_text,
)
from .html_source import html_pages_to_raw_jobs, parse_html  # noqa: F401
from .jsonl_source import read_jsonl_docs, read_jsonl_stream  # noqa: F401
from .warc_source import (  # noqa: F401
    read_warc_records,
    read_warc_stream,
    warc_html_payloads,
    write_warc_archive,
)
