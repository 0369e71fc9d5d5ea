"""Deterministic sampling: reproducibility, nesting, rate accuracy,
stratification — the properties a resumable 10^12-doc pipeline needs."""

from __future__ import annotations

import pytest

from bloqsenjin_spark import corpus
from bloqsenjin_spark.operators import sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return corpus.load_table(spark, SF, "documents")


def _ids(df):
    return {int(r["doc_id"]) for r in df.select("doc_id").collect()}


def test_deterministic_and_nested(docs):
    a1 = _ids(sampling.deterministic_sample(docs, 0.5))
    a2 = _ids(sampling.deterministic_sample(docs, 0.5))
    assert a1 == a2  # same run-to-run keep-set, no RNG state
    small = _ids(sampling.deterministic_sample(docs, 0.1))
    assert small <= a1  # equal salt ⇒ nested samples (staged scale-up)
    full = _ids(sampling.deterministic_sample(docs, 1.0))
    assert full == _ids(docs)
    assert _ids(sampling.deterministic_sample(docs, 0.0)) == set()


def test_rate_accuracy_and_salt_independence(docs):
    n = docs.count()
    for rate in (0.25, 0.5, 0.75):
        got = len(_ids(sampling.deterministic_sample(docs, rate)))
        # md5 coordinates are uniform; 500 docs ⇒ ±3σ ≈ ±0.07 at worst
        assert abs(got / n - rate) < 0.08, (rate, got, n)
    a = _ids(sampling.deterministic_sample(docs, 0.5, salt="s0"))
    b = _ids(sampling.deterministic_sample(docs, 0.5, salt="s1"))
    assert a != b  # different salt = an independent draw
    # overlap near rate² · n, not 0 and not |a|
    assert 0 < len(a & b) < len(a)


def test_stratified_rates_and_default(spark, docs):
    rates = {"en": 0.5, "de": 1.0, "fr": 0.25}
    out = sampling.stratified_sample(docs, rates, default_rate=0.75)
    by_lang_all = {r["lang"]: r["count"]
                   for r in docs.groupBy("lang").count().collect()}
    by_lang_kept = {r["lang"]: r["count"]
                    for r in out.groupBy("lang").count().collect()}
    for lang, total in by_lang_all.items():
        want = rates.get(lang, 0.75)
        got = by_lang_kept.get(lang, 0) / total
        tol = 0.2 if total < 100 else 0.1
        assert abs(got - want) < tol, (lang, got, want, total)
    # stratified keep-set for a stratum == plain sample of that stratum at
    # its rate (the per-stratum rule is exactly the unstratified rule)
    en = docs.where(docs.lang == "en")
    assert _ids(out.where(out.lang == "en")) == _ids(
        sampling.deterministic_sample(en, 0.5))


def test_empty_rates_uses_default(docs):
    out = sampling.stratified_sample(docs, {}, default_rate=0.5)
    assert _ids(out) == _ids(sampling.deterministic_sample(docs, 0.5))
