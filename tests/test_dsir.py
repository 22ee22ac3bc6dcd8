"""DSIR (operators/dsir.py) semantics:

* the per-doc importance log-weight equals a sequential pure-Python
  replay of the paper's construction (hashed unigram+bigram buckets,
  add-1 smoothing, micro-unit fixed point) — engine-independence by
  construction;
* target-like documents weigh more: the mean weight of docs drawn
  from the target distribution exceeds the mean of off-distribution
  docs;
* Gumbel-top-k is deterministic across reruns, biased toward heavy
  docs, and exactly n winners.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from vbb_data_pipeline_spark.operators.dsir import (
    LOGW_SCALE,
    dsir_logweights,
    gumbel_topk,
)

B = 64


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _grams(text: str) -> list[str]:
    t = _tokens(text)
    return t + [f"{a}_{b}" for a, b in zip(t, t[1:])]


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % B


def _round_half_up(x: float) -> int:
    import decimal

    return int(
        decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_UP)
    )


def _replay(raw: list[tuple[int, str]], target: list[str]) -> dict[int, int]:
    """Sequential replay of dsir_logweights."""
    tgt_b: dict[int, int] = {}
    for text in target:
        for g in _grams(text):
            b = _bucket(g)
            tgt_b[b] = tgt_b.get(b, 0) + 1
    raw_feat: dict[int, dict[int, int]] = {}
    raw_b: dict[int, int] = {}
    for did, text in raw:
        f = raw_feat.setdefault(did, {})
        for g in _grams(text):
            b = _bucket(g)
            f[b] = f.get(b, 0) + 1
            raw_b[b] = raw_b.get(b, 0) + 1
    nt, nr = sum(tgt_b.values()), sum(raw_b.values())
    delta = {}
    for b in set(tgt_b) | set(raw_b):
        p = (tgt_b.get(b, 0) + 1.0) / (nt + B)
        q = (raw_b.get(b, 0) + 1.0) / (nr + B)
        delta[b] = _round_half_up((math.log(p) - math.log(q)) * LOGW_SCALE)
    return {
        did: sum(c * delta[b] for b, c in f.items())
        for did, f in raw_feat.items()
    }


TARGETY = [
    "the cat sat on the mat and the dog slept",
    "the cat and the dog played on the mat",
    "a cat a dog a mat a nap in the sun",
]
OFFY = [
    "quantum flux capacitors invert tachyon polarity",
    "synergize leverage paradigm pivot stakeholder alignment",
]


@pytest.fixture(scope="module")
def corpora(spark):
    raw_rows = [(i, t) for i, t in enumerate(TARGETY + OFFY)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100, TARGETY[0]), (101, TARGETY[1])], "doc_id long, text string"
    )
    return raw, raw_rows, target


def test_logweights_match_python_replay(spark, corpora):
    raw, raw_rows, target = corpora
    got = {
        r["doc_id"]: r["logw_u"]
        for r in dsir_logweights(
            raw, target, "text", "doc_id", n_buckets=B
        ).collect()
    }
    want = _replay(raw_rows, [TARGETY[0], TARGETY[1]])
    assert got == want


def test_targety_docs_weigh_more(spark, corpora):
    raw, _, target = corpora
    got = {
        r["doc_id"]: r["logw_u"]
        for r in dsir_logweights(
            raw, target, "text", "doc_id", n_buckets=B
        ).collect()
    }
    # docs 0 and 1 ARE the target docs; with a tiny corpus and B=64
    # the third (related but vocab-shifted) doc can land anywhere, so
    # the invariant asserted is the sharp one: exact target members
    # outweigh off-distribution docs
    targety = [got[0], got[1]]
    offy = [got[i] for i in range(len(TARGETY), len(TARGETY) + len(OFFY))]
    assert min(targety) > max(offy)


def test_empty_doc_gets_zero(spark, corpora):
    _, _, target = corpora
    raw = spark.createDataFrame(
        [(0, "the cat"), (1, ""), (2, "   ...   ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["logw_u"]
        for r in dsir_logweights(
            raw, target, "text", "doc_id", n_buckets=B
        ).collect()
    }
    assert got[1] == 0 and got[2] == 0 and got[0] != 0


def test_gumbel_topk_deterministic_and_exact_n(spark, corpora):
    raw, _, target = corpora
    w = dsir_logweights(raw, target, "text", "doc_id", n_buckets=B)
    a = gumbel_topk(w, 3, "seed-1", "doc_id").collect()
    b = gumbel_topk(w, 3, "seed-1", "doc_id").collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["rank"] for r in a] == [1, 2, 3]
    # a different seed may pick a different set (noise is seed-keyed)
    c = gumbel_topk(w, 3, "seed-2", "doc_id").collect()
    assert len(c) == 3


def test_gumbel_biased_toward_heavy_docs(spark):
    # one doc with an overwhelming log-weight wins under any seed
    rows = [(0, 50 * LOGW_SCALE)] + [(i, -50 * LOGW_SCALE) for i in range(1, 8)]
    w = spark.createDataFrame(rows, "doc_id long, logw_u long")
    for seed in ("s1", "s2", "s3"):
        top = gumbel_topk(w, 1, seed, "doc_id").collect()
        assert top[0]["doc_id"] == 0
