"""PII scrubbing (functions/redact.py): placeholder semantics, ordering,
counts, null-safety, zero-shuffle plan, and Java-vs-RE2 dialect parity
(the same patterns must behave identically in DuckDB — gate precondition)."""

from __future__ import annotations

import duckdb
import pytest

from letarette_spark.functions.redact import (
    PII_PATTERNS,
    pii_counts,
    redact,
    redact_text,
)

SAMPLES = [
    (1, "mail me at jane.doe+spam@corp.example.co.uk today"),
    (2, "see https://example.com/a?b=c#frag and http://x.io"),
    (3, "server at 192.168.0.1 and 8.8.8.8 responded"),
    (4, "ssn 123-45-6789 leaked"),
    (5, "call 555-123-4567 or 555.987.6543"),
    (6, "url with creds https://u:p@host.example.com/path stays one URL"),
    (7, "clean text with numbers 12345 and dots a.b.c"),
    (8, None),
    (9, "version 1.2.3.4.5 is not an ip boundary case"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(SAMPLES, "doc_id long, text string")


def test_redaction_per_kind(df):
    rows = {r["doc_id"]: r["text"] for r in redact(df).collect()}
    assert rows[1] == "mail me at <EMAIL> today"
    assert rows[2] == "see <URL> and <URL>"
    assert rows[3] == "server at <IP> and <IP> responded"
    assert rows[4] == "ssn <SSN> leaked"
    assert rows[5] == "call <PHONE> or <PHONE>"
    # the URL pattern wins over the email inside it (order matters)
    assert rows[6] == "url with creds <URL> stays one URL"
    assert rows[7] == SAMPLES[6][1]  # untouched
    assert rows[8] is None


def test_counts(df):
    rows = {r["doc_id"]: r for r in pii_counts(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_url"] == 0
    assert rows[2]["n_url"] == 2
    assert rows[3]["n_ipv4"] == 2
    assert rows[4]["n_ssn"] == 1
    # ssn pattern also matches the dash-phone shape guard: disjoint here
    assert rows[5]["n_phone"] == 2 and rows[5]["n_ssn"] == 0
    assert all(rows[7][f"n_{k}"] == 0 for k in PII_PATTERNS)


def test_kind_selection_and_validation(df):
    only_url = {r["doc_id"]: r["text"] for r in redact(df, kinds=["url"]).collect()}
    assert only_url[1] == SAMPLES[0][1]  # email untouched
    assert "<URL>" in only_url[2]
    with pytest.raises(ValueError):
        redact(df, kinds=["nope"])


def test_zero_shuffle_plan(df):
    plan = redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_duckdb_dialect_parity(df):
    """Every pattern must produce byte-identical redaction in DuckDB
    (RE2) — the precondition for the hash-verified gate twins."""
    got = {
        r["doc_id"]: r["text"]
        for r in redact(df).collect()
    }
    con = duckdb.connect()
    for doc_id, text in SAMPLES:
        if text is None:
            continue
        args = [text]
        acc = "?"
        for k, (pat, repl) in PII_PATTERNS.items():
            acc = f"regexp_replace({acc}, ?, ?, 'g')"
            args.extend([pat, repl])
        want = con.execute(f"SELECT {acc}", args).fetchone()[0]
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
