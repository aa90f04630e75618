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


def uuid_v4(fmt: str = "hyphenated") -> Column:
    """Random UUID in the reference's 3 formats: hyphenated (default),
    simple (no hyphens), urn (function/string.rs:27-42)."""
    u = F.expr("uuid()")
    if fmt == "simple":
        return F.replace(u, F.lit("-"), F.lit(""))
    if fmt == "urn":
        return F.concat(F.lit("urn:uuid:"), u)
    return u


# --- word/sentence/paragraph generators --------------------------------------
WORDS = [
    "lorem", "ipsum", "dolor", "amet", "consectetur", "adipiscing", "elit",
    "tempor", "incididunt", "labore", "magna", "aliqua", "veniam", "nostrud",
    "ullamco", "laboris", "aliquip", "commodo", "duis", "aute",
]
COMPANIES = ["Acme Corp", "Globex", "Initech", "Umbrella", "Stark Industries", "Wayne Ent"]
INDUSTRIES = ["Software", "Finance", "Healthcare", "Retail", "Energy", "Transport"]
PROFESSIONS = ["Developer", "Accountant", "Physician", "Merchant", "Technician"]
CURRENCIES = [("US Dollar", "USD", "$"), ("Euro", "EUR", "€"), ("Yen", "JPY", "¥"),
              ("Pound", "GBP", "£"), ("Franc", "CHF", "Fr")]
STREETS = ["Main St", "Oak Ave", "Maple Dr", "Cedar Ln", "Pine Rd", "Elm Blvd"]
STATES = [("California", "CA"), ("Texas", "TX"), ("New York", "NY"), ("Ohio", "OH")]
TIMEZONES = ["UTC", "America/New_York", "Europe/Paris", "Asia/Tokyo", "Australia/Sydney"]
USER_AGENTS = [
    "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/120.0",
    "Mozilla/5.0 (Macintosh) AppleWebKit/605.1.15 Safari/605.1.15",
]


def fake_words(seed: Column, n: int = 3) -> Column:
    return F.concat_ws(" ", *[pick(seed, WORDS, 20 + i) for i in range(n)])


def fake_sentences(seed: Column, n: int = 2) -> Column:
    parts = [
        F.concat(F.initcap(fake_words(seed + i * 7, 5)), F.lit("."))
        for i in range(n)
    ]
    return F.concat_ws(" ", *parts)


def fake_paragraphs(seed: Column, n: int = 1) -> Column:
    return F.concat_ws("\n\n", *[fake_sentences(seed + i * 31, 4) for i in range(n)])


def fake_company(seed: Column) -> Column:
    return pick(seed, COMPANIES, 40)


def fake_industry(seed: Column) -> Column:
    return pick(seed, INDUSTRIES, 41)


def fake_profession(seed: Column) -> Column:
    return pick(seed, PROFESSIONS, 42)


def fake_currency_name(seed: Column) -> Column:
    return pick(seed, [c[0] for c in CURRENCIES], 43)


def fake_currency_code(seed: Column) -> Column:
    return pick(seed, [c[1] for c in CURRENCIES], 43)


def fake_currency_symbol(seed: Column) -> Column:
    return pick(seed, [c[2] for c in CURRENCIES], 43)


def fake_street_name(seed: Column) -> Column:
    return F.concat((_idx(seed, 44, 9899) + 100).cast("string"), F.lit(" "), pick(seed, STREETS, 45))


def fake_state_name(seed: Column) -> Column:
    return pick(seed, [s[0] for s in STATES], 46)


def fake_state_code(seed: Column) -> Column:
    return pick(seed, [s[1] for s in STATES], 46)


def fake_zipcode(seed: Column) -> Column:
    return F.lpad(_idx(seed, 47, 100000).cast("string"), 5, "0")


def fake_postcode(seed: Column) -> Column:
    return fake_zipcode(seed)


def fake_timezone(seed: Column) -> Column:
    return pick(seed, TIMEZONES, 48)


def fake_user_agent(seed: Column) -> Column:
    return pick(seed, USER_AGENTS, 49)


def fake_mac_address(seed: Column) -> Column:
    parts = [F.lpad(F.hex(_idx(seed, 50 + i, 256)), 2, "0") for i in range(6)]
    return F.lower(F.concat_ws(":", *parts))


def fake_ipv6(seed: Column) -> Column:
    parts = [F.lpad(F.hex(_idx(seed, 60 + i, 65536)), 4, "0") for i in range(8)]
    return F.lower(F.concat_ws(":", *parts))


def fake_credit_card(seed: Column) -> Column:
    """16-digit number with a valid Luhn check digit."""
    d15 = F.lpad(_idx(seed, 70, 10**9).cast("string"), 9, "0")
    prefix = F.concat(F.lit("424242"), d15)  # 15 digits total

    def luhn_sum(col: Column) -> Column:
        # digits right-to-left, doubling every second one
        total = F.lit(0)
        for i in range(15):
            d = F.substring(col, 15 - i, 1).cast("int")
            if i % 2 == 0:  # rightmost payload digit gets doubled
                dd = d * 2
                d = F.when(dd > 9, dd - 9).otherwise(dd)
            total = total + d
        return total

    check = F.pmod(10 - F.pmod(luhn_sum(prefix), F.lit(10)), F.lit(10))
    return F.concat(prefix, check.cast("string"))


def fake_barcode(seed: Column) -> Column:
    return F.lpad(_idx(seed, 80, 10**12).cast("string"), 13, "0")


def fake_job_seniority(seed: Column) -> Column:
    return pick(seed, ["Junior", "Mid", "Senior", "Staff", "Principal"], 81)


def fake_job_field(seed: Column) -> Column:
    return pick(seed, ["Engineering", "Sales", "Marketing", "Support", "Ops"], 82)


def fake_job_position(seed: Column) -> Column:
    return F.concat_ws(" ", fake_job_seniority(seed), fake_job_field(seed))


def fake_country_name(seed: Column) -> Column:
    return pick(seed, ["United States", "France", "Germany", "Japan", "Brazil", "India"], 83)


def fake_title(seed: Column) -> Column:
    return pick(seed, ["Mr", "Ms", "Dr", "Prof"], 84)
