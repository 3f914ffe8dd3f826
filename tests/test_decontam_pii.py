"""Decontamination (eval n-gram overlap) and PII scrub operators:
hand-built goldens with known overlaps / known PII placements."""

from __future__ import annotations

from fgcspark.pii import pii_clean, pii_scrub
from fgcspark.textops import decontaminate, decontaminated


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_decontaminate_counts_shared_ngrams(spark):
    corpus = _docs(
        spark,
        [
            # shares the eval trigram "alpha beta gamma" once
            (1, "alpha beta gamma delta epsilon"),
            # shares two distinct eval trigrams
            (2, "alpha beta gamma x omega psi chi y alpha beta gamma"),
            # no overlap
            (3, "one two three four five"),
        ],
    )
    ev = _docs(spark, [(100, "alpha beta gamma"), (101, "omega psi chi")])
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(corpus, ev, n=3).collect()
    }
    # doc 2's repeated "alpha beta gamma" is ONE distinct shingle:
    # shingles are per-doc distinct, so n_hits counts distinct shared
    # n-grams, not occurrences.
    assert hits == {1: 1, 2: 2}

    clean = decontaminated(corpus, ev, n=3)
    assert [r["doc_id"] for r in clean.collect()] == [3]
    assert clean.columns == corpus.columns


def test_decontaminate_ngram_shorter_than_doc(spark):
    corpus = _docs(spark, [(1, "a b"), (2, "a b c d")])
    ev = _docs(spark, [(9, "a b c")])
    hits = decontaminate(corpus, ev, n=3).collect()
    # doc 1 is too short to contain any trigram at all
    assert {(r["doc_id"], r["n_hits"]) for r in hits} == {(2, 1)}


def test_pii_scrub_counts_and_masks(spark):
    docs = _docs(
        spark,
        [
            (1, "write to bob.smith+x@mail.example.org today"),
            (2, "server 192.168.0.1 and backup 10.0.0.2"),
            (3, "call +358551234567 now"),
            (4, "nothing sensitive here"),
            (5, "a@b.io via 8.8.8.8 or +123456789 ok"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 0, 0)
    assert out[1]["scrubbed"] == "write to <EMAIL> today"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 2, 0)
    assert out[2]["scrubbed"] == "server <IP> and backup <IP>"
    assert out[3]["scrubbed"] == "call <PHONE> now"
    assert out[4]["scrubbed"] == "nothing sensitive here"
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (1, 1, 1)
    assert out[5]["scrubbed"] == "<EMAIL> via <IP> or <PHONE> ok"

    clean = pii_clean(docs)
    assert [r["doc_id"] for r in clean.collect()] == [4]


def test_pii_email_digits_not_rematched(spark):
    # after email masking, the digits of user123@10x.net must not be
    # re-detected as an IP or phone (replacement-order contract)
    docs = _docs(spark, [(1, "mail user123@h10.example.net ok")])
    row = pii_scrub(docs).collect()[0]
    assert row["scrubbed"] == "mail <EMAIL> ok"
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (1, 0, 0)
