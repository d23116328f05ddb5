"""F1/F2 — title and company-name cleaning as native expression chains.

Semantics replicated from the reference's pandas ``.apply`` cleaners
(src/etl/staging/cleaners.py:26-80 clean_title, 83-122
clean_company_name) — but set-based: a chain of regexp_replace /
transform() expressions that Catalyst fuses into one codegen stage, so
cleaning 10^9 titles costs one scan and zero Python round-trips.

Java-regex note: Java's ``\\w``/``\\b`` are ASCII-only by default and
would mangle Vietnamese; patterns carry ``(?U)`` (unicode classes) and
``(?iu)`` (unicode case folding) where the reference relied on
Python/Postgres unicode defaults.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tech words kept fully uppercase (cleaners.py:6-17)
TECH_WORDS = {
    "PHP", "JAVA", "PYTHON", "AWS", "SQL", "HTML", "CSS", "JS", "UI", "UX",
    "AI", "ML", "IOS", "API", "IT", "CNTT", "REACT", "VUE", "ANGULAR", "NODE",
    "DEVOPS", "QA", "BA", "PM", "HR", "ERP", "CRM", "SAP", "BTP", "CAP",
    "NET", "GO", "RUST", "KOTLIN", "SWIFT", "FLUTTER", "DART",
    "NODEJS", "NEXTJS", "REACTJS", "VUEJS", "TYPESCRIPT", "JAVASCRIPT",
    "MONGODB", "MYSQL", "POSTGRESQL", "REDIS", "DOCKER", "K8S", "KUBERNETES",
    "GIT", "CI", "CD", "GCP", "AZURE", "IOT", "MEP", "HVAC", "BIM",
    "ODOO", "LARAVEL", "SPRING", "SPRINGBOOT", "DJANGO", "FLASK", "FASTAPI",
    "MSB", "SI", "LG", "CNS", "MISA", "FPT", "VIETTEL", "VNPT", "IS", "IEC",
    "ABI", "DNSE", "BRSE", "SQA",
}

# Company abbreviations kept uppercase (cleaners.py:21-24)
COMPANY_ABBR = {
    "TNHH", "CP", "CPĐT", "JSC", "LLC", "INC", "LTD", "CO", "CORP",
    "BPO", "IT", "AI", "IOT", "ERP", "CRM",
}

# Salary/location suffix patterns stripped from titles (cleaners.py:37-55)
_TITLE_REMOVE_PATTERNS = [
    r"(?iu)\s*[-–]\s*Thu Nhập.*$",
    r"(?iu)\s*[-–]\s*Upto.*$",
    r"(?iu)\s*[-–]\s*Up to.*$",
    r"(?iu)\s*[-–]\s*Salary.*$",
    r"(?iu)\s*[-–]\s*Lương.*$",
    r"(?iu)\s*[-–]\s*Tại\s+(Hà Nội|HCM|Hồ Chí Minh|Đà Nẵng).*$",
    r"(?iu)\s*[-–]\s*Từ\s+\d+.*$",
    r"(?iu)\s*[-–]\s*Tối Thiểu.*$",
    r"(?iu)\s*\[Hà Nội\].*$",
    r"(?iu)\s*\[HCM\].*$",
    r"(?iu)\s*\[Hồ Chí Minh\].*$",
    r"(?iu)\s*\|\s*Thu Nhập.*$",
    r"(?iu)\s*\|\s*Lương.*$",
    r"(?iu)\s+Thu Nhập Từ\s+\d+.*$",
    r"(?iu)\s+Lương Upto.*$",
    r"(?iu)\s+Onboard Sau Tết.*$",
]


def clean_title(col: Column) -> Column:
    """Strip salary/location suffixes, fix spacing, protect C++/C#/.NET.

    Null/empty → '' (the reference returns '' for NaN/empty input).
    """
    t = F.trim(col.cast("string"))
    # 1. remove salary/location suffixes
    for pat in _TITLE_REMOVE_PATTERNS:
        t = F.regexp_replace(t, pat, "")
    # 2. space before '(' if missing
    t = F.regexp_replace(t, r"(?U)(\w)\(", r"$1 (")
    # 3. space after ':' and ','
    t = F.regexp_replace(t, r"(?U):(\w)", r": $1")
    t = F.regexp_replace(t, r"(?U),(\w)", r", $1")
    # 4. protect C++ / C#
    t = F.regexp_replace(t, r"C\+\+", "___CPLUSPLUS___")
    t = F.regexp_replace(t, r"C#", "___CSHARP___")
    # 5. drop special chars (keep word chars incl. Vietnamese, ()/-.$,: )
    t = F.regexp_replace(t, r"(?U)[^\w\s\(\)\/\-\.\$,:]", " ")
    # 6. restore
    t = F.regexp_replace(t, r"___CPLUSPLUS___", "C++")
    t = F.regexp_replace(t, r"___CSHARP___", "C#")
    # 7. normalize .NET casing
    t = F.regexp_replace(t, r"(?iu)\.NET\b", ".NET")
    # 8. squeeze whitespace
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return F.when(col.isNull(), F.lit("")).otherwise(t)


_CASE_WHITELIST = sorted(COMPANY_ABBR | TECH_WORDS)


def _word_case(w: Column) -> Column:
    """Per-word casing rule (cleaners.py:104-116), as a transform() lambda."""
    upper = F.upper(w)
    rest_lower = F.lower(w.substr(F.lit(2), F.length(w)))
    return (
        F.when(upper.isin(_CASE_WHITELIST), upper)
        # camelCase words kept as-is (Upper, lower-run, Upper)
        .when(w.rlike(r"^[A-Z][a-z]+[A-Z]"), w)
        # digit-led tokens uppercased
        .when(w.rlike(r"(?U)^\d+\w*$"), upper)
        # Python str.capitalize(): first upper, REST LOWER
        .when(F.length(w) > 1, F.concat(F.upper(F.substring(w, 1, 1)), rest_lower))
        .otherwise(upper)
    )


def clean_company_name(col: Column) -> Column:
    """Normalize company name: strip specials + recruitment keywords,
    per-word casing with TECH/ABBR whitelists, fix 'Công TY' artifacts."""
    n = F.trim(col.cast("string"))
    # 1. drop special chars (keep ()[]-/.,&+#)
    n = F.regexp_replace(n, r"(?U)[^\w\s\(\)\[\]\-\/\.,&+#]", " ")
    n = F.trim(F.regexp_replace(n, r"\s+", " "))
    # 2. remove recruitment keywords
    for pat in (
        r"(?iuU)\btuyển\s+dụng\b",
        r"(?iuU)\bcần\s+tuyển\b",
        r"(?iuU)\bđang\s+tuyển\b",
        r"(?iuU)\bhot\b",
        r"(?iuU)\bgấp\b",
    ):
        n = F.regexp_replace(n, pat, "")
    n = F.trim(F.regexp_replace(n, r"\s+", " "))
    # 3. per-word casing — one codegen'd higher-order function, no UDF
    n = F.array_join(F.transform(F.split(n, " "), _word_case), " ")
    # 4. fix special patterns
    n = F.regexp_replace(n, r"(?U)\bCông TY\b", "Công Ty")
    n = F.regexp_replace(n, r"(?U)\bNgân HÀNG\b", "Ngân Hàng")
    n = F.trim(F.regexp_replace(n, r"\s+", " "))
    return F.when(col.isNull(), F.lit("")).otherwise(n)
