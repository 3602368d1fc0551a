"""PII redaction + n-gram repetition metrics: kernel unit tests,
independent straightforward references, and Ray-stage parity.

Per the repo invariant, the optimized kernel never doubles as its own
oracle: the references here are written from the metric DEFINITIONS
(set-of-duplicated-ngrams, position cover) and compared element-wise.
"""

from __future__ import annotations

import collections

import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from mistralocr_pdf2md_translator_ray.functions.redact import (
    EMAIL_TOKEN,
    IP_TOKEN,
    PHONE_TOKEN,
    dup_ngram_char_frac,
    redact_pii,
    repetition_metrics,
    top_ngram_char_frac,
)
from mistralocr_pdf2md_translator_ray.stages.textstats import (
    redact_documents,
    repetition_stats,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- reference
def _ref_dup_frac(toks: list[str], n: int) -> float:
    """Straightforward reference: counter over n-grams, then a set of
    covered positions built occurrence-by-occurrence."""
    if len(toks) < n:
        return 0.0
    grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    cnt = collections.Counter(grams)
    covered: set[int] = set()
    for i, g in enumerate(grams):
        if cnt[g] > 1:
            covered.update(range(i, i + n))
    total = sum(len(t) for t in toks)
    if total == 0:
        return 0.0
    return sum(len(toks[i]) for i in covered) / total


def _ref_top_frac(toks: list[str], n: int) -> float:
    if len(toks) < n:
        return 0.0
    grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    cnt = collections.Counter(grams)
    best_count = max(cnt.values())
    top = min(g for g, c in cnt.items() if c == best_count)
    covered: set[int] = set()
    for i, g in enumerate(grams):
        if g == top:
            covered.update(range(i, i + n))
    total = sum(len(t) for t in toks)
    if total == 0:
        return 0.0
    return sum(len(toks[i]) for i in covered) / total


class TestRedactKernel:
    def test_email(self):
        out, e, i, p = redact_pii("mail bob.smith+tag@sub.example.co.uk now")
        assert out == f"mail {EMAIL_TOKEN} now" and (e, i, p) == (1, 0, 0)

    def test_ipv4(self):
        out, e, i, p = redact_pii("host 192.168.0.1 and 8.8.8.8.")
        assert out == f"host {IP_TOKEN} and {IP_TOKEN}." and (e, i, p) == (0, 2, 0)

    def test_ipv4_bounds(self):
        # octets >255 and dotted version strings must NOT match
        for s in ("ver 1.2.3.4000", "999.1.1.1 x", "1.2.3.4.5"):
            out, _, n_ip, _ = redact_pii(s)
            assert n_ip == 0 and out == s, s

    def test_phone_forms(self):
        for s in ("call 555-867-5309 ok", "call (212) 555-0188 ok",
                  "call +1 415.555.2671 ok"):
            out, e, i, p = redact_pii(s)
            assert p == 1 and PHONE_TOKEN in out, s

    def test_phone_non_matches(self):
        # bare digit runs, order ids, years — not phones
        for s in ("order 5558675309", "id 123-45-678", "in 2024-01-02"):
            _, _, _, p = redact_pii(s)
            assert p == 0, s

    def test_email_wins_over_phone_digits(self):
        out, e, i, p = redact_pii("x 555-867-5309@example.com y")
        assert e == 1 and p == 0 and out == f"x {EMAIL_TOKEN} y"

    def test_empty_and_clean(self):
        assert redact_pii("") == ("", 0, 0, 0)
        assert redact_pii("no pii here") == ("no pii here", 0, 0, 0)

    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_idempotent_and_clean_output(self, s):
        out, e, i, p = redact_pii(s)
        # masking is idempotent: a second pass finds nothing new
        out2, e2, i2, p2 = redact_pii(out)
        assert (e2, i2, p2) == (0, 0, 0)
        assert out2 == out
        # counts equal the placeholders inserted
        assert out.count(EMAIL_TOKEN) >= e  # text may already contain tokens
        if EMAIL_TOKEN not in s and IP_TOKEN not in s and PHONE_TOKEN not in s:
            assert out.count(EMAIL_TOKEN) == e
            assert out.count(IP_TOKEN) == i
            assert out.count(PHONE_TOKEN) == p


class TestRepetitionKernel:
    def test_no_repetition(self):
        # no duplicated n-grams; the (tie-broken) top 2-gram ("a","b")
        # covers 2 of the 5 token chars
        assert repetition_metrics("a b c d e") == (0.0, 0.0, 0.4)

    def test_fully_duplicated(self):
        # "x y x y" — every 2-gram duplicated
        d2, d3, t2 = repetition_metrics("x y x y")
        assert d2 == 1.0 and d3 == 0.0 and t2 == 1.0

    def test_short_and_empty(self):
        assert repetition_metrics("") == (0.0, 0.0, 0.0)
        assert repetition_metrics("one") == (0.0, 0.0, 0.0)

    def test_boilerplate_scores_high(self):
        clean = "the quick brown fox jumps over the lazy dog today again"
        spam = "click here click here click here click here click here"
        assert repetition_metrics(spam)[0] > repetition_metrics(clean)[0]
        assert repetition_metrics(spam)[2] > 0.9

    @given(st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
                    max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_matches_reference(self, toks):
        for n in (2, 3):
            assert dup_ngram_char_frac(toks, n) == pytest.approx(
                _ref_dup_frac(toks, n), abs=1e-12)
            assert top_ngram_char_frac(toks, n) == pytest.approx(
                _ref_top_frac(toks, n), abs=1e-12)

    @given(st.lists(st.sampled_from(["a", "bb", "ccc"]), min_size=2,
                    max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_bounds_and_monotonicity(self, toks):
        d2 = dup_ngram_char_frac(toks, 2)
        t2 = top_ngram_char_frac(toks, 2)
        assert 0.0 <= d2 <= 1.0 and 0.0 <= t2 <= 1.0
        # doubling the document forces every original 2-gram to repeat
        d2_doubled = dup_ngram_char_frac(toks + toks, 2)
        assert d2_doubled >= d2 - 1e-12


class TestRayStageParity:
    def test_redact_documents_matches_reference(self, ray_session):
        rows = redact_documents(SF).take_all()
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        ref = {d: redact_pii(x) for d, x in
               zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
        assert len(rows) == t.num_rows
        for r in rows:
            exp = ref[r["doc_id"]]
            assert (r["text_redacted"], r["n_emails"], r["n_ips"],
                    r["n_phones"]) == exp

    def test_redact_counts_on_planted_pii(self, ray_session):
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["contact a@b.com or c.d@e.org",
                     "server 10.0.0.1 phone 555-867-5309",
                     "clean text"],
        })
        import os
        import tempfile

        import pyarrow.parquet as pq

        with tempfile.TemporaryDirectory() as td:
            pq.write_table(tbl, os.path.join(td, "documents.parquet"))
            got = {r["doc_id"]: r for r in redact_documents(td).take_all()}
        assert got[1]["n_emails"] == 2 and EMAIL_TOKEN in got[1]["text_redacted"]
        assert got[2]["n_ips"] == 1 and got[2]["n_phones"] == 1
        assert got[3]["text_redacted"] == "clean text"

    def test_repetition_stats_matches_reference(self, ray_session):
        rows = repetition_stats(SF).take_all()
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        ref = {}
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = x.split() if x else []
            ref[d] = (round(_ref_dup_frac(toks, 2), 6),
                      round(_ref_dup_frac(toks, 3), 6),
                      round(_ref_top_frac(toks, 2), 6))
        assert len(rows) == t.num_rows
        for r in rows:
            exp = ref[r["doc_id"]]
            assert (r["dup_2gram_frac"], r["dup_3gram_frac"],
                    r["top_2gram_frac"]) == exp
