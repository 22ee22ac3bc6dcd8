"""BPE tokenizer-training prep (operators/bpe.py): the distributed
trainer must produce EXACTLY the merge table a sequential reference
implementation produces from the same corpus (Sennrich et al. 2016
semantics: most-frequent adjacent pair, left-to-right non-overlapping
merge, end-of-word marker), and encoding must replay the merges."""

from __future__ import annotations

import collections
import re

import pytest
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators.bpe import (
    EOW,
    bpe_encode_words,
    bpe_train,
    initial_vocab,
    pair_counts,
    word_counts,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Sequential reference replay (the oracle)
# ---------------------------------------------------------------------------
def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_bpe_train(texts, n_merges, min_pair_count=2):
    wc = collections.Counter()
    for t in texts:
        wc.update(_py_tokens(t))
    vocab = {w: tuple(list(w) + [EOW]) for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, syms in vocab.items():
            n = wc[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # max count, then lexicographically smallest (a, b)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        new_vocab = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )


def test_train_matches_sequential_reference(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    want_merges, want_vocab = _py_bpe_train(texts, n_merges=12)

    got_merges, got_vocab = bpe_train(docs, "text", n_merges=12)
    assert got_merges == want_merges

    got = {
        r["word"]: tuple(r["syms"])
        for r in got_vocab.select("word", "syms").collect()
    }
    assert got == want_vocab


def test_word_counts_match_python(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    wc = collections.Counter()
    for t in texts:
        wc.update(_py_tokens(t))
    got = {
        r["word"]: r["n"] for r in word_counts(docs, "text").collect()
    }
    assert got == dict(wc)


def test_encode_replays_merges(spark, docs):
    """Encoding a word with the learned merge table equals the final
    vocab's symbol sequence for that word."""
    merges, vocab = bpe_train(docs, "text", n_merges=8)
    words = vocab.select("word")
    enc = bpe_encode_words(words, merges)
    got = {
        r["word"]: tuple(r["subwords"])
        for r in enc.collect()
    }
    want = {
        r["word"]: tuple(r["syms"])
        for r in vocab.select("word", "syms").collect()
    }
    assert got == want


def test_merge_determinism_across_partitionings(spark, docs):
    """The merge table must not depend on physical partitioning."""
    m1, _ = bpe_train(docs.repartition(1), "text", n_merges=6)
    m2, _ = bpe_train(docs.repartition(7, "doc_id"), "text", n_merges=6)
    assert m1 == m2


def test_corpus_scanned_once(spark, docs):
    """The merge loop must run on the vocab table only: after the
    initial word-count materialization, per-round plans read the
    localCheckpoint, never the corpus. Guard: the pair-count plan over
    the trained vocab contains no parquet/LocalTableScan of documents
    columns (text) — it scans checkpointed (word, syms, n) rows."""
    _, vocab = bpe_train(docs, "text", n_merges=3)
    plan = pair_counts(vocab)._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan
    assert "Scan parquet" not in plan


def test_fully_merged_word_does_not_crash(spark):
    """Enough merges collapse a frequent word to ONE symbol; the
    has-pair probe must guard the size before indexing (sequence(0,-1)
    walks backwards into syms[-1] under ANSI — regression caught by
    the sf0.1 trainer run)."""
    df = spark.createDataFrame([("ab ab ab ab",)], "text string")
    merges, vocab = bpe_train(df, "text", n_merges=10, min_pair_count=1)
    rows = {r["word"]: tuple(r["syms"]) for r in vocab.collect()}
    assert rows["ab"] == ("ab" + EOW,)  # fully collapsed, single symbol
    # python replay agrees end-to-end
    want_merges, want_vocab = _py_bpe_train(
        ["ab ab ab ab"], n_merges=10, min_pair_count=1
    )
    assert merges == want_merges
    assert rows == want_vocab


def test_pair_counts_weighting(spark):
    df = spark.createDataFrame(
        [("ab ab xy",)], "text string"
    )
    vocab = initial_vocab(word_counts(df, "text"))
    pc = {
        (r["a"], r["b"]): r["pair_n"]
        for r in pair_counts(vocab).collect()
    }
    # "ab" occurs twice -> ('a','b') weighted 2; 'b</w>' likewise
    assert pc[("a", "b")] == 2
    assert pc[("b", EOW)] == 2
    assert pc[("x", "y")] == 1
    assert pc[("y", EOW)] == 1
