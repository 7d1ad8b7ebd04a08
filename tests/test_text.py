"""Text-analysis operator tests on synthetic rows + the documents table."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
    word_count,
)

SF_DIR = "/root/testdata/sf0.001"


def test_token_count(spark):
    df = spark.createDataFrame(
        [("hello world",), ("  a  b   c ",), ("",), (None,)], "text string"
    )
    got = [r.n_tokens for r in token_count(df).collect()]
    assert got == [2, 3, 0, None]


def test_word_count_splits_subword_units(spark):
    df = spark.createDataFrame([("hello, world42!",)], "text string")
    # hello | , | world | 42 | !
    assert word_count(df).collect()[0].n_words == 5


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is on the mat",),
            ("der hund und die katze das haus",),
            ("le chat et la maison les arbres des fleurs",),
            ("xyzzy qwerty plugh",),
            (None,),
        ],
        "text string",
    )
    got = [r.lang_pred for r in language_id(df).collect()]
    assert got == ["en", "de", "fr", "und", "und"]


def test_quality_score_orders_sensibly(spark):
    df = spark.createDataFrame(
        [
            ("a" * 5,),
            ("the quick brown fox jumps over the lazy dog " * 10,),
            ("!!!,,,;;;???...",),
        ],
        "text string",
    )
    got = [r.quality for r in quality_score(df).collect()]
    assert got[1] > got[0]  # long clean prose beats tiny fragment
    assert got[1] > got[2]  # ... and pure punctuation
    assert all(0.0 <= q <= 1.0 for q in got)


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("  hello world ",), ("different",)], "text string"
    )
    got = [r.fp for r in fingerprint(df).collect()]
    assert got[0] == got[1] != got[2]


def test_operators_run_on_documents_table(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = fingerprint(quality_score(language_id(token_count(docs))))
    row = out.filter(F.col("text").isNotNull()).select(
        "n_tokens", "lang_pred", "quality", "fp"
    ).first()
    assert row.n_tokens is not None and row.fp is not None


def test_redact_pii_scrubs_all_occurrences(spark):
    from dataingestion_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e-f.org twice"),
            (2, "call +1 (415) 555-1234 or 415-555-9999"),
            (3, "ssn 123-45-6789 inline"),
            (4, "clean text"),
            (5, None),
            (6, "cards 4111 1111 1111 1111, 4111-1111-1111-1111, 4111111111111111"),
            (7, "hosts 10.0.0.1 and 192.168.255.255 up"),
        ],
        "id int, text string",
    )
    got = {r["id"]: r["text"] for r in redact_pii(df).collect()}
    assert got[1] == "mail <EMAIL> and <EMAIL> twice"
    assert got[2] == "call <PHONE> or <PHONE>"
    assert got[3] == "ssn <SSN> inline"
    assert got[4] == "clean text"
    assert got[5] is None
    assert got[6] == "cards <CARD>, <CARD>, <CARD>"
    assert got[7] == "hosts <IP> and <IP> up"
