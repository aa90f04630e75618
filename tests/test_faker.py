"""Faker surface: determinism, validity, coverage of the reference's 36 fns."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from chewdata_spark.functions import faker
from chewdata_spark.functions.checksum import column_digest, file_digests


def _gen(spark, n=50):
    return spark.range(n)


def test_faker_surface_coverage():
    fns = [n for n in dir(faker) if n.startswith("fake_")]
    assert len(fns) >= 34, f"only {len(fns)} faker fns: {fns}"


def test_deterministic_across_partitions(spark):
    df = _gen(spark)
    cols = {
        "name": faker.fake_first_name(F.col("id")),
        "email": faker.fake_email(F.col("id")),
        "cc": faker.fake_credit_card(F.col("id")),
        "mac": faker.fake_mac_address(F.col("id")),
        "words": faker.fake_words(F.col("id")),
    }
    a = df.withColumns(cols).orderBy("id").collect()
    b = _gen(spark).repartition(13).withColumns(cols).orderBy("id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_value_shapes(spark):
    row = (
        _gen(spark, 200)
        .select(
            faker.fake_ipv4(F.col("id")).alias("ip4"),
            faker.fake_ipv6(F.col("id")).alias("ip6"),
            faker.fake_mac_address(F.col("id")).alias("mac"),
            faker.fake_zipcode(F.col("id")).alias("zip"),
            faker.fake_credit_card(F.col("id")).alias("cc"),
            faker.fake_latitude(F.col("id")).alias("lat"),
            faker.fake_longitude(F.col("id")).alias("lon"),
        )
        .collect()
    )
    for r in row:
        assert re.fullmatch(r"(\d{1,3}\.){3}\d{1,3}", r.ip4)
        assert re.fullmatch(r"([0-9a-f]{4}:){7}[0-9a-f]{4}", r.ip6)
        assert re.fullmatch(r"([0-9a-f]{2}:){5}[0-9a-f]{2}", r.mac)
        assert re.fullmatch(r"\d{5}", r.zip)
        assert re.fullmatch(r"\d{16}", r.cc)
        assert -90 <= r.lat <= 90 and -180 <= r.lon <= 180


def test_credit_card_luhn_valid(spark):
    rows = _gen(spark, 100).select(faker.fake_credit_card(F.col("id")).alias("cc")).collect()

    def luhn_ok(num: str) -> bool:
        digits = [int(c) for c in num][::-1]
        total = sum(digits[0::2]) + sum(d * 2 - 9 if d * 2 > 9 else d * 2 for d in digits[1::2])
        return total % 10 == 0

    assert all(luhn_ok(r.cc) for r in rows)


def test_checksum_column_and_files(spark, tmp_path):
    import hashlib

    df = spark.createDataFrame([("hello",)], "s: string")
    got = df.select(column_digest("s", "sha256").alias("d")).collect()[0].d
    assert got == hashlib.sha256(b"hello").hexdigest()
    p = tmp_path / "f.bin"
    p.write_bytes(b"abc123")
    rows = file_digests(spark, str(p), "sha3_256").collect()
    assert rows[0].digest == hashlib.sha3_256(b"abc123").hexdigest()
