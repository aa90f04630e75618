"""Deterministic faker functions (reference: src/updater/tera_helpers/function/faker.rs:36-715).

The reference registers 36 faker generators (names, addresses, emails,
phone numbers, ...).  Ours are *deterministic* given a seed column —
`value = LIST[(seed * KNUTH + salt) mod P mod len]` — so synthetic data
is reproducible across runs and engines (the reference's are random;
determinism is strictly more useful for testing and still satisfies the
"synthetic data seed" role).  All are native Column expressions:
generation at 100 TB runs inside codegen, no Python.

`pick_sql` emits the equivalent ANSI/DuckDB SQL from the *same* Python
lists so oracle queries stay in lockstep by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761
P = 1000003

FIRST_NAMES = [
    "Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Henry",
    "Iris", "Jack", "Karen", "Liam", "Mona", "Noah", "Olga", "Paul",
    "Quinn", "Rosa", "Sam", "Tara",
]
LAST_NAMES = [
    "Smith", "Jones", "Garcia", "Chen", "Patel", "Mueller", "Rossi",
    "Kim", "Sato", "Lopez", "Novak", "Silva", "Khan", "Ivanov", "Dubois",
]
CITIES = [
    "Springfield", "Rivertown", "Lakeside", "Hillcrest", "Meadowbrook",
    "Stonebridge", "Fairview", "Oakdale", "Elmwood", "Brookhaven",
]
COUNTRY_CODES = ["US", "FR", "DE", "JP", "BR", "IN", "GB", "ES", "IT", "CN", "CA", "AU"]
JOBS = [
    "Engineer", "Analyst", "Designer", "Manager", "Scientist", "Writer",
    "Teacher", "Nurse", "Chef", "Pilot",
]
COLORS = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd", "#8c564b"]


def _idx(seed: Column, salt: int, n: int) -> Column:
    return F.pmod(seed.cast("long") * KNUTH + salt, P) % n


def pick(seed: Column, values: list[str], salt: int) -> Column:
    """Deterministic element pick — array literal + modular index."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_idx(seed, salt, len(values)) + 1).cast("int"))


def pick_sql(seed_expr: str, values: list[str], salt: int) -> str:
    """DuckDB SQL equivalent of :func:`pick` built from the same list."""
    arr = "[" + ", ".join("'" + v.replace("'", "''") + "'" for v in values) + "]"
    return f"list_extract({arr}, CAST((({seed_expr}) * {KNUTH} + {salt}) % {P} % {len(values)} + 1 AS INT))"


def fake_first_name(seed: Column) -> Column:
    return pick(seed, FIRST_NAMES, 1)


def fake_last_name(seed: Column) -> Column:
    return pick(seed, LAST_NAMES, 2)


def fake_city(seed: Column) -> Column:
    return pick(seed, CITIES, 3)


def fake_country_code(seed: Column) -> Column:
    return pick(seed, COUNTRY_CODES, 4)


def fake_job(seed: Column) -> Column:
    return pick(seed, JOBS, 5)


def fake_color_hex(seed: Column) -> Column:
    return pick(seed, COLORS, 6)


def fake_email(seed: Column) -> Column:
    return F.concat(
        F.lower(fake_first_name(seed)), F.lit("."), F.lower(fake_last_name(seed)),
        F.lit("@example.com"),
    )


def fake_digit(seed: Column) -> Column:
    return _idx(seed, 7, 10)


def fake_phone_number(seed: Column) -> Column:
    return F.concat(
        F.lit("+1-555-"),
        F.lpad((_idx(seed, 8, 10000)).cast("string"), 4, "0"),
    )


def fake_ipv4(seed: Column) -> Column:
    return F.concat_ws(
        ".",
        (_idx(seed, 9, 223) + 1).cast("string"),
        _idx(seed, 10, 256).cast("string"),
        _idx(seed, 11, 256).cast("string"),
        (_idx(seed, 12, 254) + 1).cast("string"),
    )


def fake_latitude(seed: Column) -> Column:
    return F.round(_idx(seed, 13, 180000).cast("double") / 1000.0 - 90.0, 3)


def fake_longitude(seed: Column) -> Column:
    return F.round(_idx(seed, 14, 360000).cast("double") / 1000.0 - 180.0, 3)


def fake_password(seed: Column, min_len: int = 8, max_len: int = 16) -> Column:
    """Deterministic password: base62-ish from repeated hashing."""
    length = (_idx(seed, 15, max_len - min_len + 1) + min_len).cast("int")
    raw = F.sha2(F.concat(seed.cast("string"), F.lit(":pw")), 256)
    return F.substring(raw, 1, 32).substr(F.lit(1), length)


def uuid_v4() -> Column:
    """Random UUID (reference: function/string.rs:27-42)."""
    return F.expr("uuid()")
