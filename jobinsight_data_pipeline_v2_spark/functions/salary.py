"""F3 — Vietnamese salary-text normalization (11-branch regex cascade).

Replicates jobinsight_staging.normalize_salary
(sql/procedures/staging_procedures.sql:8-84) as one native ``when``
cascade producing a struct<salary_min, salary_max, salary_type>; branch
ORDER is semantic and preserved exactly:

 1. null/empty/thoả thuận/thương lượng → negotiable
 2. cạnh tranh                         → competitive
 3. literal '0.0 - 0.0 triệu'          → negotiable
 4. 'x - y USD'   (commas=thousands)   → range   (×25,000 VND)
 5. 'x - y triệu' (comma=decimal)      → range   (×1,000,000)
 6. 'tới x USD'                        → upto
 7. 'tới x triệu'                      → upto
 8. 'từ x triệu'                       → from
 9. 'x USD' no '-'                     → range (min=max)
10. 'x triệu' no '-'                   → range (min=max)
11. else                               → unknown

The comma handling differs per currency on purpose: '1,000 USD' is one
thousand dollars; '2,5 triệu' is 2.5 million đồng.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

USD_RATE = 25_000
MILLION = 1_000_000

_DEC = "decimal(18,2)"

# Postgres '~*' is case-insensitive; Vietnamese needs unicode folding.
_RANGE_USD = r"(?iu)([0-9,.]+)\s*-\s*([0-9,.]+)\s*usd"
_RANGE_TRIEU = r"(?iu)([0-9,.]+)\s*-\s*([0-9,.]+)\s*triệu"
_UPTO_USD = r"(?iu)tới\s+([0-9,.]+)\s*usd"
_UPTO_TRIEU = r"(?iu)tới\s+([0-9,.]+)\s*triệu"
_FROM_TRIEU = r"(?iu)từ\s+([0-9,.]+)\s*triệu"
_SINGLE_USD = r"(?iu)([0-9,.]+)\s*usd"
_SINGLE_TRIEU = r"(?iu)([0-9,.]+)\s*triệu"


def _usd(num: Column) -> Column:
    """USD amount: strip thousands-commas, ×25,000 VND."""
    return (F.regexp_replace(num, ",", "").cast(_DEC) * USD_RATE).cast(_DEC)


def _trieu(num: Column) -> Column:
    """'triệu' amount: comma is the decimal separator, ×1,000,000 VND."""
    return (F.regexp_replace(num, ",", ".").cast(_DEC) * MILLION).cast(_DEC)


def _ext(col: Column, pat: str, group: int) -> Column:
    return F.regexp_extract(col, pat, group)


def normalize_salary(col: Column) -> Column:
    """salary text → struct(salary_min, salary_max, salary_type)."""
    s = col.cast("string")
    lower = F.lower(s)
    null_dec = F.lit(None).cast(_DEC)

    def result(mn: Column, mx: Column, typ: str) -> Column:
        return F.struct(
            mn.alias("salary_min"), mx.alias("salary_max"), F.lit(typ).alias("salary_type")
        )

    no_dash = ~s.rlike("-")

    return (
        # 1. negotiable / empty
        F.when(
            col.isNull()
            | (s == "")
            | lower.rlike("thoả thuận|thỏa thuận|thương lượng"),
            result(null_dec, null_dec, "negotiable"),
        )
        # 2. competitive
        .when(lower.rlike("cạnh tranh"), result(null_dec, null_dec, "competitive"))
        # 3. degenerate zero range
        .when(s == "0.0 - 0.0 triệu", result(null_dec, null_dec, "negotiable"))
        # 4. range USD
        .when(
            s.rlike(_RANGE_USD),
            result(_usd(_ext(s, _RANGE_USD, 1)), _usd(_ext(s, _RANGE_USD, 2)), "range"),
        )
        # 5. range triệu
        .when(
            s.rlike(_RANGE_TRIEU),
            result(
                _trieu(_ext(s, _RANGE_TRIEU, 1)),
                _trieu(_ext(s, _RANGE_TRIEU, 2)),
                "range",
            ),
        )
        # 6. upto USD
        .when(
            s.rlike(_UPTO_USD),
            result(null_dec, _usd(_ext(s, _UPTO_USD, 1)), "upto"),
        )
        # 7. upto triệu
        .when(
            s.rlike(_UPTO_TRIEU),
            result(null_dec, _trieu(_ext(s, _UPTO_TRIEU, 1)), "upto"),
        )
        # 8. from triệu
        .when(
            s.rlike(_FROM_TRIEU),
            result(_trieu(_ext(s, _FROM_TRIEU, 1)), null_dec, "from"),
        )
        # 9. single USD (no dash anywhere)
        .when(
            s.rlike(_SINGLE_USD) & no_dash,
            result(_usd(_ext(s, _SINGLE_USD, 1)), _usd(_ext(s, _SINGLE_USD, 1)), "range"),
        )
        # 10. single triệu (no dash anywhere)
        .when(
            s.rlike(_SINGLE_TRIEU) & no_dash,
            result(
                _trieu(_ext(s, _SINGLE_TRIEU, 1)),
                _trieu(_ext(s, _SINGLE_TRIEU, 1)),
                "range",
            ),
        )
        # 11. unknown
        .otherwise(result(null_dec, null_dec, "unknown"))
    )
