"""Generic main-content extraction (boilerplate removal).

The crawl-to-corpus front door: given an arbitrary HTML page, keep
the human-readable main content and drop navigation, headers,
footers, ads, and other chrome — jusText / trafilatura semantics
re-expressed as DETERMINISTIC integer rules so the decision is
oracle-checkable and replay-stable (no model weights, no floats):

1. **Prune** subtrees that are never content: structural chrome tags
   (``nav``/``header``/``footer``/``aside``/``form``/…), non-text
   tags (``script``/``style``/…), and any element whose ``class`` or
   ``id`` carries a boilerplate word (``menu``, ``footer``, ``ad``,
   ``banner``, ``cookie``, ``share``, …) at a ``-``/``_``/space
   token boundary — the word-boundary match keeps legitimate tokens
   like ``add`` or ``admin-panel``'s ``admin`` intact.
2. **Segment** the surviving DOM into LEAF blocks: an element whose
   tag is block-level (``p``, ``h1``–``h6``, ``li``, ``td``, ``pre``,
   ``blockquote``, ``div``, ``article``, ``section``) and whose
   pruned subtree contains no further block-level element. A ``div``
   that wraps paragraphs is a container, not a block; a ``div`` with
   only inline content is a block (jusText's finest-granularity
   segmentation). Text outside any leaf block (e.g. loose text
   between paragraphs in a container div) is not extracted —
   documented contract, pinned by the golden tests.
3. **Classify** each block by two integer rules (the jusText
   stopword/density test's deterministic core): keep iff
   ``n_words >= {MIN_WORDS}`` AND ``3 * n_link_words <= n_words``
   (link density ≤ 1/3, evaluated by cross-multiplication — a block
   dominated by anchor text is a link list, not prose).
4. **Emit** kept blocks in document order, words space-joined within
   a block, blocks newline-joined.

Word order inside a block follows the mini-DOM's ``flow`` list (the
original text/element interleaving) — ``<p>a <a>b</a> c</p>``
extracts ``a b c``, not ``a c b``.

Spark surface: ``extract_main_text`` wraps the extractor in one
Arrow-batched ``mapInPandas`` (a sanctioned Python edge like the HTML
job parser and the media codecs — the logic is inherently recursive
tree walking, not expressible as columnar expressions). One page =
one row; the transform is stateless, so the same callable serves
batch frames and structured-streaming micro-batches unchanged.

Reference analog: the reference parses fixed job-posting selectors
(src/crawler/parser.py semantics); this operator is the
general-corpus generalization a 100 TB crawl pipeline needs before
``curate_corpus``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .html_source import _dom, _Node

MIN_WORDS = 5
# keep iff LINK_NUM * n_link_words <= n_words  (link density <= 1/3)
LINK_NUM = 3

#: subtrees that are never main content, by tag alone
PRUNE_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "iframe", "svg",
        "canvas", "head", "nav", "header", "footer", "aside", "form",
        "button", "select", "option", "label", "figure", "figcaption",
    }
)

#: block-level tags that can START a leaf block
BLOCK_TAGS = frozenset(
    {
        "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
        "pre", "blockquote", "div", "article", "section", "main",
    }
)

# boilerplate vocabulary matched against class/id at -/_/space token
# boundaries (never inside a longer word: 'add' or 'madvert' survive)
_BOILER_WORDS = (
    "nav|navbar|menu|header|footer|sidebar|side|advert|ad|ads|banner|"
    "promo|sponsor|cookie|consent|social|share|sharing|breadcrumb|"
    "breadcrumbs|comment|comments|related|widget|popup|modal|subscribe|"
    "newsletter|pagination|copyright|disclaimer|masthead|toolbar"
)
_BOILER_RE = re.compile(
    rf"(?:^|[\s_-])(?:{_BOILER_WORDS})(?:$|[\s_-])", re.IGNORECASE
)


def _pruned(node: _Node) -> bool:
    if node.tag in PRUNE_TAGS:
        return True
    for attr in ("class", "id"):
        v = node.attrs.get(attr)
        if v and _BOILER_RE.search(v):
            return True
    return False


def _has_block_descendant(node: _Node) -> bool:
    for c in node.children:
        if _pruned(c):
            continue
        if c.tag in BLOCK_TAGS or _has_block_descendant(c):
            return True
    return False


def _block_words(node: _Node, in_link: bool, out: list) -> None:
    """Append (word, is_link) pairs in document order via ``flow``."""
    for kind, item in node.flow:
        if kind == "text":
            for w in item.split():
                out.append((w, in_link))
        else:
            if _pruned(item):
                continue
            _block_words(item, in_link or item.tag == "a", out)


def extract_blocks(html: str) -> list[dict]:
    """All leaf blocks of the page with their classification — the
    inspectable form (``extract_main_content`` is the one callers
    use). Each dict: tag, text, n_words, n_link_words, kept."""
    blocks: list[dict] = []

    def walk(node: _Node) -> None:
        for c in node.children:
            if _pruned(c):
                continue
            if c.tag in BLOCK_TAGS and not _has_block_descendant(c):
                words: list = []
                _block_words(c, False, words)
                n = len(words)
                n_link = sum(1 for _, is_l in words if is_l)
                blocks.append(
                    {
                        "tag": c.tag,
                        "text": " ".join(w for w, _ in words),
                        "n_words": n,
                        "n_link_words": n_link,
                        "kept": n >= MIN_WORDS and LINK_NUM * n_link <= n,
                    }
                )
            else:
                walk(c)

    walk(_dom(html))
    return blocks


_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


def rescue_headings(blocks: list[dict]) -> list[dict]:
    """jusText's near-good smoothing for the one case the flat rule
    battery systematically misclassifies: a SHORT heading immediately
    followed by a kept block is part of the content, not chrome
    ("Installation" above its paragraph). Rescue a dropped h1–h6 block
    iff it has ≥ 1 word, satisfies the link-density rule, and the NEXT
    block in document order is kept AFTER smoothing — the reverse pass
    cascades through consecutive headings (h2 over a rescued h3 over a
    kept paragraph all survive, matching real page nesting). One
    deterministic reverse pass; returns new dicts (input untouched),
    rescued blocks carry ``rescued: True``."""
    out: list[dict] = []
    next_kept = False
    for b in reversed(blocks):
        nb = dict(b)
        if (
            not nb["kept"]
            and nb["tag"] in _HEADING_TAGS
            and nb["n_words"] >= 1
            and LINK_NUM * nb["n_link_words"] <= nb["n_words"]
            and next_kept
        ):
            nb["kept"] = True
            nb["rescued"] = True
        next_kept = nb["kept"]
        out.append(nb)
    out.reverse()
    return out


def extract_main_content(
    html: str, keep_headings: bool = False
) -> tuple[str, int, int]:
    """(main_text, n_blocks_kept, n_blocks_dropped): kept blocks in
    document order, newline-joined. ``keep_headings=True`` applies the
    jusText near-good smoothing (``rescue_headings``)."""
    blocks = extract_blocks(html)
    if keep_headings:
        blocks = rescue_headings(blocks)
    kept = [b["text"] for b in blocks if b["kept"]]
    return "\n".join(kept), len(kept), len(blocks) - len(kept)


def extract_main_text(
    pages: DataFrame,
    html_col: str = "html",
    keep_headings: bool = False,
) -> DataFrame:
    """Distributed boilerplate removal: every column of ``pages``
    except ``html_col`` passes through; the page itself is replaced by
    (``text``, ``n_blocks_kept``, ``n_blocks_dropped``). One page =
    one output row (pages with zero kept blocks emit empty text, so
    downstream quality gates — not silent drops — decide their fate).
    ``keep_headings=True`` applies the jusText near-good smoothing
    (``rescue_headings``). Stateless mapInPandas: works identically
    on batch and streaming frames, Arrow-batched, no shuffle."""
    carry = [f for f in pages.schema.fields if f.name != html_col]
    clash = {"text", "n_blocks_kept", "n_blocks_dropped"} & {
        f.name for f in carry
    }
    if clash:
        raise ValueError(
            f"extract_main_text: pass-through columns {sorted(clash)} "
            "collide with the extractor's output columns — rename them "
            "before extraction (a duplicate name would silently "
            "shadow the carried values and break downstream column "
            "resolution)"
        )
    schema = StructType(
        list(carry)
        + [
            StructField("text", StringType(), True),
            StructField("n_blocks_kept", LongType(), True),
            StructField("n_blocks_dropped", LongType(), True),
        ]
    )
    carry_names = [f.name for f in carry]

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = {n: pdf[n] for n in carry_names}
            texts, n_kept, n_drop = [], [], []
            for h in pdf[html_col]:
                t, k, d = extract_main_content(
                    h if h is not None else "",
                    keep_headings=keep_headings,
                )
                texts.append(t)
                n_kept.append(k)
                n_drop.append(d)
            out["text"] = texts
            out["n_blocks_kept"] = n_kept
            out["n_blocks_dropped"] = n_drop
            yield pd.DataFrame(out)

    return pages.mapInPandas(batches, schema)
