"""F7 — deterministic business-key hashing.

compute_company_hash (dimensions/company.py:16-20):
md5(utf8(lower(strip(name)))); empty/null → md5('unknown').
Byte-identical to the reference on any UTF-8 input, and usable as a
join/partition key at any scale (uniform 128-bit distribution).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MD5_UNKNOWN = hashlib.md5(b"unknown").hexdigest()


def company_bk_hash(name: Column) -> Column:
    """Business-key hash for a company name column.

    Fidelity note: the reference falls back to md5('unknown') only for
    None/'' — a whitespace-only name strips to '' and hashes md5(b'')
    (company.py:17-20); we reproduce that exactly.
    """
    s = name.cast("string")
    cleaned = F.trim(F.lower(s))
    return F.when(name.isNull() | (s == ""), F.lit(MD5_UNKNOWN)).otherwise(
        F.md5(cleaned.cast("binary"))
    )
