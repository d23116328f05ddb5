"""HTML→RAW_JOBS parse edge (SURVEY S2), dependency-free.

Mirrors the reference parser's multi-selector fallback strategy
(src/config/parser_config.py:6-100) and field extraction
(src/data_sources/topcv/parser.py:109-254), rebuilt on the stdlib
``html.parser`` — no BeautifulSoup in this container — with a small
CSS-subset selector engine covering exactly the selector forms the
config uses: ``tag``, ``.class``, ``tag.class``, ``[attr]``,
``[attr*='v']``, and descendant chains of those.

The Spark edge is ``html_pages_to_raw_jobs``: an Arrow-batched
``mapInPandas`` over captured page blobs — the one sanctioned Python
hot-path exception (SURVEY §2.10): real HTML parsing is irreducibly
imperative. Parsing is per-page embarrassingly parallel; partitioning
by page keeps it linear at any crawl size.

One deliberate divergence: the reference stamps ``posted_time`` from
the wall clock minus the parsed "Cập nhật X trước" offset
(parser.py:209-214). The engine never reads the wall clock —
``posted_time`` is left NULL here and derived from
(crawled_at, last_update) in staging_transform (same value,
deterministic and re-runnable).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame

from ..schemas import RAW_JOBS

# parser_config.py:6-100 — selector lists, tried in order
SELECTORS: dict[str, list[str] | str] = {
    "job_item": [
        "div.job-item-2",
        "div.job-item",
        "div[class*='job-item']",
        "article.job-listing",
    ],
    "job_id_attr": "data-job-id",
    "title": [
        "h3.title a span[data-original-title]",
        "h3.title a",
        "h3.title",
        ".job-title a",
        "[class*='title'] a",
    ],
    "title_attr": "data-original-title",
    "job_url": [
        "h3.title a",
        ".job-title a",
        "a[href*='/viec-lam/']",
        "a[href*='/job/']",
    ],
    "company": [
        "a.company",
        ".company-name a",
        "a[class*='company']",
        ".employer-name",
    ],
    "location": [
        "label.address",
        ".job-address",
        ".location",
        "[class*='address']",
        "[class*='location']",
    ],
    "salary": [
        "label.title-salary",
        ".salary",
        "[class*='salary']",
        ".job-salary",
    ],
    "skills_container": [
        "div.skills label.item",
        ".skills .item",
        ".skill-tag",
        "[class*='skill']",
    ],
    "skills_extra_attr": "data-original-title",
    "deadline": [
        "label.time strong",
        ".deadline strong",
        ".time strong",
        "[class*='deadline']",
    ],
    "verified_badge": [
        "span.vip-badge",
        ".verified-badge",
        "[class*='vip']",
        "[class*='verified']",
    ],
    "last_update": [
        "label.deadline",
        "span.time",
        ".update-time",
        "[class*='update']",
    ],
    "logo": [
        "a img",
        ".company-logo img",
        "img[class*='logo']",
    ],
}

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _Node:
    """One element of the mini-DOM.

    ``texts``/``children`` keep the historical split shape the selector
    engine and ``get_text`` consume; ``flow`` additionally records the
    ORIGINAL interleaving of text and child elements (("text", str) /
    ("node", _Node) entries in document order) — the main-content
    extractor (html_extract.py) needs in-order traversal to emit words
    in reading order, which the split lists cannot reconstruct."""

    __slots__ = ("tag", "attrs", "children", "parent", "texts", "flow")

    def __init__(self, tag: str, attrs: dict[str, str], parent):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node] = []
        self.parent = parent
        self.texts: list[str] = []
        self.flow: list[tuple] = []

    @property
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def get(self, name: str) -> str | None:
        return self.attrs.get(name)

    def get_text(self) -> str:
        """BeautifulSoup get_text(strip=True) equivalent: stripped
        descendant strings joined without separator."""
        parts: list[str] = []
        self._collect_text(parts)
        return "".join(parts)

    def _collect_text(self, parts: list[str]) -> None:
        for t in self.texts:
            s = t.strip()
            if s:
                parts.append(s)
        for c in self.children:
            c._collect_text(parts)

    def descendants(self):
        for c in self.children:
            yield c
            yield from c.descendants()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]", {}, None)
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        self._stack[-1].flow.append(("node", node))
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        self._stack[-1].flow.append(("node", node))

    def handle_endtag(self, tag):
        # close the nearest matching open tag (tolerates sloppy HTML)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        self._stack[-1].texts.append(data)
        self._stack[-1].flow.append(("text", data))


def _dom(html: str) -> _Node:
    b = _TreeBuilder()
    b.feed(html)
    return b.root


# --- selector subset engine -------------------------------------------------

_COMPOUND_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<attrs>(?:\[[^\]]+\])*)$"
)
_ATTR_RE = re.compile(r"\[([\w-]+)(?:(\*?=)'?\"?([^'\"\]]*)'?\"?)?\]")


def _parse_compound(s: str):
    m = _COMPOUND_RE.match(s)
    if not m:
        raise ValueError(f"unsupported selector: {s!r}")
    tag = m.group("tag")
    classes = [c for c in m.group("classes").split(".") if c]
    attrs = []
    for name, op, value in _ATTR_RE.findall(m.group("attrs")):
        attrs.append((name, op or "exists", value))
    return tag, classes, attrs


def _matches(node: _Node, compound) -> bool:
    tag, classes, attrs = compound
    if tag and node.tag != tag:
        return False
    if not set(classes) <= node.classes:
        return False
    for name, op, value in attrs:
        got = node.attrs.get(name)
        if got is None:
            return False
        if op == "*=" and value not in got:
            return False
        if op == "=" and value != got:
            return False
    return True


def select(scope: _Node, selector: str) -> list[_Node]:
    """All descendants of ``scope`` matching a descendant-chain
    selector, in document order."""
    chain = [_parse_compound(part) for part in selector.split()]
    out = []
    for node in scope.descendants():
        if not _matches(node, chain[-1]):
            continue
        # ancestors (within scope) must satisfy the prefix in order
        need = len(chain) - 2
        anc = node.parent
        while need >= 0 and anc is not None and anc is not scope.parent:
            if _matches(anc, chain[need]):
                need -= 1
            anc = anc.parent
        if need < 0:
            out.append(node)
    return out


def select_one(scope: _Node, selector: str) -> _Node | None:
    found = select(scope, selector)
    return found[0] if found else None


def _try_selectors(scope: _Node, selectors: list[str]) -> _Node | None:
    """parser.py _try_selectors: first selector that yields a node."""
    for s in selectors:
        el = select_one(scope, s)
        if el is not None:
            return el
    return None


# --- field extraction (parser.py:109-254) -----------------------------------

_BASE = "https://www.topcv.vn"
_ID_FROM_URL = re.compile(r"-(\d+)\.html")


def _abs_url(href: str) -> str:
    return f"{_BASE}{href}" if href.startswith("/") else href


def _extract_job(item: _Node) -> dict | None:
    job: dict = {
        "job_id": None, "title": None, "job_url": None,
        "company_name": None, "company_url": None, "salary": None,
        "skills": [], "location": None, "deadline": None,
        "verified_employer": False, "last_update": None, "logo_url": None,
    }
    job["job_id"] = item.get(SELECTORS["job_id_attr"])
    if not job["job_id"]:
        for a in select(item, "a[href]"):
            m = _ID_FROM_URL.search(a.get("href") or "")
            if m:
                job["job_id"] = m.group(1)
                break
    el = _try_selectors(item, SELECTORS["title"])
    if el is not None:
        job["title"] = el.get(SELECTORS["title_attr"]) or el.get_text()
    el = _try_selectors(item, SELECTORS["job_url"])
    if el is not None and el.get("href"):
        job["job_url"] = _abs_url(el.get("href"))
    el = _try_selectors(item, SELECTORS["company"])
    if el is not None:
        job["company_name"] = el.get_text()
        if el.get("href"):
            job["company_url"] = _abs_url(el.get("href"))
    el = _try_selectors(item, SELECTORS["location"])
    if el is not None:
        job["location"] = el.get_text()
    el = _try_selectors(item, SELECTORS["salary"])
    if el is not None:
        job["salary"] = el.get_text()
    extra_attr = SELECTORS["skills_extra_attr"]
    for selector in SELECTORS["skills_container"]:
        elements = select(item, selector)
        if elements:
            for e in elements:
                text = e.get_text()
                extra = e.get(extra_attr)
                if text.endswith("+") and extra:
                    if not extra.startswith("<"):
                        job["skills"].extend(s.strip() for s in extra.split(","))
                elif text:
                    job["skills"].append(text)
            break
    el = _try_selectors(item, SELECTORS["deadline"])
    if el is not None:
        job["deadline"] = el.get_text()
    for selector in SELECTORS["verified_badge"]:
        if select_one(item, selector) is not None:
            job["verified_employer"] = True
            break
    el = _try_selectors(item, SELECTORS["last_update"])
    if el is not None:
        job["last_update"] = el.get_text()
    el = _try_selectors(item, SELECTORS["logo"])
    if el is not None and el.get("src"):
        job["logo_url"] = el.get("src")
    if not job["job_id"] or not job["title"]:
        return None
    return job


def parse_html(html: str) -> list[dict]:
    """parser.py parse_html: container fallbacks, per-page job_id dedup
    (first occurrence wins), invalid rows dropped."""
    root = _dom(html)
    items: list[_Node] = []
    for selector in SELECTORS["job_item"]:
        items = select(root, selector)
        if items:
            break
    jobs, seen = [], set()
    for item in items:
        job = _extract_job(item)
        if job and job["job_id"] not in seen:
            seen.add(job["job_id"])
            jobs.append(job)
    return jobs


# --- Spark edge -------------------------------------------------------------


def html_pages_to_raw_jobs(pages: DataFrame, crawled_at) -> DataFrame:
    """Captured page blobs → RAW_JOBS rows (Arrow-batched mapInPandas).

    ``pages`` needs an ``html`` column (string or binary). Each
    partition parses its pages independently — linear in page count,
    no shuffle. ``posted_time`` stays NULL (derived downstream in
    staging_transform from crawled_at + last_update).
    """
    import pandas as pd

    cols = [f.name for f in RAW_JOBS.fields]

    def gen(batches):
        for pdf in batches:
            rows = []
            for html in pdf["html"]:
                if isinstance(html, (bytes, bytearray)):
                    html = html.decode("utf-8")
                for job in parse_html(html):
                    job = dict(job)
                    job["posted_time"] = None
                    job["crawled_at"] = crawled_at
                    rows.append([job[c] for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return pages.mapInPandas(gen, schema=RAW_JOBS)


# --- HTML blob layer (S12: page capture sink/source) ------------------------
#
# The reference backs up every crawled page to MinIO `jobinsight-raw`
# for parse debugging, retained 15 days (retention_policies.md:40-58).
# Here the capture layer is parquet binary blobs under
# {root}/html/ingest_date=YYYY-MM-DD — the exact layer the default
# RetentionPolicy("html", 15, "delete") in maintenance.py sweeps —
# content-addressed with sha256 like every other binary payload in the
# engine (operators/multimodal.py).

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def write_html_blobs(pages: DataFrame, root: str, as_of) -> None:
    """Persist captured pages (columns: page_url, html string|binary)
    as content-addressed binary blobs for one ingest date."""
    payload = (
        F.col("html").cast("binary")
        if dict(pages.dtypes)["html"] == "string"
        else F.col("html")
    )
    (
        pages.select(
            "page_url",
            payload.alias("payload"),
            F.sha2(payload, 256).alias("content_sha256"),
            F.length(payload).alias("n_bytes"),
        )
        .write.mode("overwrite")
        .parquet(f"{root.rstrip('/')}/html/ingest_date={as_of.isoformat()}")
    )


def read_html_blobs(spark: SparkSession, root: str, as_of) -> DataFrame:
    """One day's captured pages (the parse-debugging source)."""
    return spark.read.parquet(
        f"{root.rstrip('/')}/html/ingest_date={as_of.isoformat()}"
    )


def blobs_to_raw_jobs(blobs: DataFrame, crawled_at) -> DataFrame:
    """Captured blobs → RAW_JOBS rows (payload bytes → parser edge)."""
    return html_pages_to_raw_jobs(
        blobs.select(F.col("payload").alias("html")), crawled_at
    )
