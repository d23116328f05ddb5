"""Unicode normalization at the Arrow edge (NFC/NFKC/NFD/NFKD).

A standard early step of every text-curation pipeline: the same
visible string can arrive as composed codepoints (é = U+00E9) or as
base + combining marks (e + U+0301), and every downstream exact-match
operator — exact dedup, shingle hashing, token counting, benchmark
decontamination — silently treats the two as different documents
unless the corpus is normalized first.

Spark SQL has NO normalization built-in (DuckDB ships
``nfc_normalize``; the JVM's ``java.text.Normalizer`` is not exposed
as a SQL function), so this is a sanctioned Arrow-batched edge like
the HTML parser and the media decoders: a scalar ``pandas_udf`` over
``unicodedata`` — one Arrow batch in, one out, zero shuffle, narrow.
Normalization is idempotent and per-row, so the same column works
unchanged on streams (stateless projection).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def normalize_column(col: str | Column, form: str = "NFC") -> Column:
    """Column expression: ``col`` Unicode-normalized to ``form``.

    NULLs pass through. The udf is resolved per call (not at import)
    so the ``form`` constant is baked into the closure — each form is
    its own vectorized kernel.
    """
    if form not in _FORMS:
        raise ValueError(f"normalize_column: form={form!r} not in {_FORMS}")

    import pandas as pd  # noqa: F401  (Arrow edge)

    @F.pandas_udf("string")
    def _norm(s):  # type: ignore[no-untyped-def]
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(F.col(col) if isinstance(col, str) else col)


def fold_accents_column(col: str | Column) -> Column:
    """Column expression: ``col`` with accents folded away — NFD
    decomposition, combining marks (category Mn) dropped, NFC
    recomposition. 'Hà Nội' → 'Ha Noi'; characters that are NOT
    base+mark compositions (Đ — D WITH STROKE has no decomposition)
    survive, matching utf8proc's ``strip_accents`` (the DuckDB oracle
    this fold is differentially pinned against).

    The search-normalization sibling of ``normalize_column``: same
    sanctioned Arrow edge, stateless, narrow, stream-safe. NULLs pass
    through."""
    import pandas as pd  # noqa: F401  (Arrow edge)

    @F.pandas_udf("string")
    def _fold(s):  # type: ignore[no-untyped-def]
        import unicodedata

        def one(x):
            if x is None:
                return None
            d = unicodedata.normalize("NFD", x)
            return unicodedata.normalize(
                "NFC",
                "".join(c for c in d if unicodedata.category(c) != "Mn"),
            )

        return s.map(one)

    return _fold(F.col(col) if isinstance(col, str) else col)
