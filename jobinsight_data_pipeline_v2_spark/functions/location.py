"""F8 — TopCV location parsing + Vietnamese province-merge normalization.

Replicates dimensions/location.py:14-87 (parse_location,
normalize_city_name) as a native array expression: the only
"UDTF-shaped" scalar function in the reference becomes
split → filter → transform, exploded by the caller. No UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Provinces MERGED in the administrative reform → need ' (mới)' suffix
MERGED_PROVINCES = {
    "Tuyên Quang", "Lào Cai", "Thái Nguyên", "Phú Thọ", "Bắc Ninh",
    "Hưng Yên", "Hải Phòng", "Ninh Bình", "Quảng Trị", "Đà Nẵng",
    "Quảng Ngãi", "Gia Lai", "Khánh Hòa", "Lâm Đồng", "Đắk Lắk",
    "Hồ Chí Minh", "Đồng Nai", "Tây Ninh", "Cần Thơ", "Vĩnh Long",
    "Đồng Tháp", "Cà Mau", "An Giang",
}

# Provinces NOT merged → strip any ' (mới)' suffix
NOT_MERGED_PROVINCES = {
    "Hà Nội", "Huế", "Lai Châu", "Điện Biên", "Sơn La", "Lạng Sơn",
    "Quảng Ninh", "Thanh Hóa", "Nghệ An", "Hà Tĩnh", "Cao Bằng",
}

FOREIGN_COUNTRIES = [
    "Nước Ngoài", "Nhật Bản", "Hàn Quốc", "Đài Loan", "Singapore",
    "Malaysia", "Thái Lan", "Trung Quốc", "Mỹ", "Úc", "Đức", "Pháp",
    "Anh", "Canada", "Japan", "Korea", "Taiwan", "USA", "Australia",
]


def normalize_city_name(city: Column) -> Column:
    """Vietnam administrative-reform normalization (location.py:36-57)."""
    c = F.trim(city)
    base = F.trim(F.replace(c, F.lit(" (mới)"), F.lit("")))
    return (
        F.when(base.isin(sorted(NOT_MERGED_PROVINCES)), base)
        .when(base.isin(sorted(MERGED_PROVINCES)), F.concat(base, F.lit(" (mới)")))
        .otherwise(c)
    )


def parse_location(col: Column) -> Column:
    """location text → array<struct<city,country>> (location.py:60-87).

    - null/''/nan/none/null-literals → empty array
    - whole string is a known foreign country → [('Unknown', country)]
    - else split on ' & ': drop 'nơi khác' and empties; foreign parts
      → ('Unknown', part); Vietnamese parts → (normalized, 'Vietnam').
    """
    s = F.trim(col.cast("string"))
    invalid = (
        col.isNull() | F.lower(s).isin("", "nan", "none", "null")
    )
    parts = F.transform(F.split(s, " & "), F.trim)
    kept = F.filter(
        parts,
        lambda p: (~F.lower(p).contains("nơi khác"))
        & (p != "")
        & (~F.lower(p).isin("nan", "none")),
    )
    per_part = F.transform(
        kept,
        lambda p: F.when(
            p.isin(FOREIGN_COUNTRIES),
            F.struct(F.lit("Unknown").alias("city"), p.alias("country")),
        ).otherwise(
            F.struct(
                normalize_city_name(p).alias("city"), F.lit("Vietnam").alias("country")
            )
        ),
    )
    empty = F.array().cast("array<struct<city:string,country:string>>")
    return (
        F.when(invalid, empty)
        .when(
            s.isin(FOREIGN_COUNTRIES),
            F.array(F.struct(F.lit("Unknown").alias("city"), s.alias("country"))),
        )
        .otherwise(per_part)
    )
