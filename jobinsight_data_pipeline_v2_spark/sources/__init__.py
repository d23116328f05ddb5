"""Out-of-engine data sources (SURVEY S1/S2 edge).

The crawler itself stays out-of-engine by design; this package holds
the HTML→rows parse edge (html_source) that turns captured page blobs
into RAW_JOBS rows inside Spark.
"""

from .html_source import html_pages_to_raw_jobs, parse_html  # noqa: F401
