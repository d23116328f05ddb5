"""Markdown → plain-text extraction, fully in-plan.

The code/docs-corpus sibling of ``html_extract``: README / wiki /
documentation dumps arrive as Markdown, and a training corpus wants
the prose with the markup semantics applied — fenced code blocks
DROPPED (they are a different modality, routed to a code pipeline,
not prose), link text kept without URLs, images dropped, emphasis /
heading / list / quote markers stripped, and blank structure lines
collapsed.

Unlike the HTML extractor (a stateless Arrow edge — real parsing
needs a tree), Markdown's block grammar is line-oriented and regular
enough for a pure JVM-side expression chain: every rule below is a
``regexp_replace`` and the whole extraction stays inside whole-stage
codegen with zero Python in the path — the preferred shape at 100 TB
(narrow, no Arrow hop, no shuffle).

Rule order matters and is part of the spec:

1. fenced code blocks ``(?s)```…```'' removed first (their content
   must never reach the inline rules);
2. images ``![alt](url)`` removed before links (an image IS a link
   with a ``!`` prefix — link-first would leave the alt text);
3. links ``[text](url)`` → text;
4. inline code ``` `x` ``` → x;
5. bold ``**x**`` → x before italic ``*x*`` (italic-first would pair
   the bold delimiters);
6. line-anchored markers: ATX headings ``^#{1,6} ``, list bullets
   ``^[-+*] ``, blockquotes ``^> ``;
7. normalize: split lines, trim each, drop empties, join with \\n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) in application order — see the module
# docstring for why the order is load-bearing
_MD_RULES: tuple[tuple[str, str], ...] = (
    (r"(?s)```.*?```", ""),  # fenced code blocks
    (r"!\[[^\]]*\]\([^)]*\)", ""),  # images
    (r"\[([^\]]*)\]\(([^)]*)\)", "$1"),  # links -> text
    (r"`([^`]*)`", "$1"),  # inline code
    (r"\*\*([^*]*)\*\*", "$1"),  # bold
    (r"\*([^*]*)\*", "$1"),  # italic
    (r"(?m)^#{1,6} +", ""),  # ATX headings
    (r"(?m)^[-+*] +", ""),  # list bullets
    (r"(?m)^> ?", ""),  # blockquotes
)


def markdown_to_text(col: Column) -> Column:
    """Plain text of a Markdown document as one JVM-side expression.

    Patterns are passed as Columns (``F.lit``) so backslashes never
    transit a SQL string literal (CLAUDE.md rule 4)."""
    out = col
    for pat, repl in _MD_RULES:
        out = F.regexp_replace(out, F.lit(pat), F.lit(repl))
    lines = F.transform(F.split(out, "\n"), lambda x: F.trim(x))
    return F.array_join(F.filter(lines, lambda x: x != ""), "\n")


def extract_markdown_text(
    df: DataFrame, md_col: str = "markdown", out_col: str = "text"
) -> DataFrame:
    """(… , out_col): `df` with the extracted plain text appended —
    the batch/stream-shared transform (fully narrow and stateless, so
    a readStream frame takes it verbatim)."""
    return df.withColumn(out_col, markdown_to_text(F.col(md_col)))
