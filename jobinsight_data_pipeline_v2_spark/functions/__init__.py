"""Scalar function library (SURVEY §2.8) — native column expressions only.

Every scalar transform of the reference is re-expressed as a Catalyst
column expression (whole-stage-codegen'd, zero Python in the hot path);
the engine's Python-UDF surface for reference parity is empty
(SURVEY §2.10 design rule).

Java-regex note: Spark compiles Java regex, the reference used Python/
Postgres regex. Java's ``\\w``/``\\b`` are ASCII-only by default, which
would mangle Vietnamese text — every pattern that touches word chars or
boundaries carries ``(?U)`` (UNICODE_CHARACTER_CLASS), and every
case-insensitive match on Vietnamese carries ``(?iu)`` (CASE_INSENSITIVE
+ UNICODE_CASE).
"""

from .cleaning import clean_company_name, clean_title
from .hashing import company_bk_hash
from .location import normalize_city_name, parse_location
from .salary import normalize_salary
from .timeparse import due_date_from_deadline, last_update_seconds, time_remaining

__all__ = [
    "clean_company_name",
    "clean_title",
    "company_bk_hash",
    "normalize_city_name",
    "parse_location",
    "normalize_salary",
    "due_date_from_deadline",
    "last_update_seconds",
    "time_remaining",
]
