"""PII redaction: exact-value tests for pattern hits, misses and
application order (email must win before phone eats its digits)."""

from gofaiss_spark.functions.text import PII_PATTERNS, pii_count, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        redact_pii("text").alias("red"),
        *[pii_count("text", k).alias(k) for k, _, _ in PII_PATTERNS],
    ).collect()[0]


def test_all_patterns_hit(spark):
    r = _one(
        spark,
        "mail a.b@x.co or +1 555-123-4567, ip 10.0.0.1, ssn 123-45-6789 "
        "key 0123456789abcdef0123456789abcdef tail",
    )
    assert r["red"] == (
        "mail <EMAIL> or +1 <PHONE>, ip <IP>, ssn <SSN> key <KEY> tail"
    )
    assert [r[k] for k, _, _ in PII_PATTERNS] == [1, 1, 1, 1, 1]


def test_clean_text_untouched(spark):
    text = "the quick brown fox count 12 and 3.5 ratio"
    r = _one(spark, text)
    assert r["red"] == text
    assert all(r[k] == 0 for k, _, _ in PII_PATTERNS)


def test_multiple_matches_counted(spark):
    r = _one(spark, "a@b.io c@d.io e@f.io")
    assert r["email"] == 3
    assert r["red"] == "<EMAIL> <EMAIL> <EMAIL>"


def test_short_hex_not_a_key(spark):
    # 31 hex chars: below the 32-char secret threshold
    r = _one(spark, "hash 0123456789abcdef0123456789abcde done")
    assert r["hexkey"] == 0
