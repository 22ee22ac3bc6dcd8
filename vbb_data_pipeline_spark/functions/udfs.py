"""Arrow-vectorized Python UDF surface (SURVEY.md §2.10).

The engine's hot paths are all native column expressions — Python
appears only where built-ins genuinely cannot express the semantics
(multimodal decode via ``mapInPandas``, stateful streaming via
``applyInPandasWithState``). This module completes the §2.10 trio
with the SCALAR ``pandas_udf`` shape, for operations that need a
Python library over numeric batches (the embedding-scoring escape
hatch). Batches arrive as Arrow-backed pandas Series — ~10-100×
faster than row-at-a-time Python UDFs — but still lose to the
codegen'd native dot product (operators/similarity.dot), which is why
the registry queries never use this path; it exists for operators the
JVM cannot host (learned scorers, tokenizers with native libs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine over two array<float/double> columns.

    Total: NULL on either side yields NULL (never a task failure), and
    empty Arrow batches return empty. Semantics match
    ``operators/similarity.cosine`` (1e-12 norm floor).
    """
    import numpy as np

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    mask = a.notna() & b.notna()
    out = pd.Series([None] * len(a), dtype="float64")
    if mask.any():
        av = np.stack(a[mask].to_numpy())
        bv = np.stack(b[mask].to_numpy())
        dots = (av * bv).sum(axis=1)
        norms = np.sqrt((av * av).sum(axis=1)) * np.sqrt((bv * bv).sum(axis=1))
        out[mask] = dots / np.maximum(norms, 1e-12)
    return out


def cosine_udf(a: Column | str, b: Column | str) -> Column:
    """Column wrapper: Arrow-batched cosine (see :func:`cosine_pandas`)."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    to_d = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    return cosine_pandas(to_d(ac), to_d(bc))


# ---------------------------------------------------- UDAF: grouped agg

@pandas_udf(T.DoubleType())
def weighted_mean_pandas(x: pd.Series, w: pd.Series) -> float:
    """GROUPED_AGG pandas_udf — the UDAF shape of §2.10.

    Weighted mean of ``x`` under weights ``w`` per group; NULL pairs
    are ignored, an all-NULL (or zero-weight) group yields NULL rather
    than raising. Exists to demonstrate the Arrow-batched aggregation
    escape hatch; the same semantic compiles natively as
    ``sum(x*w)/sum(w)`` (which the parity test asserts) and the native
    form is what the registry queries use.
    """
    mask = x.notna() & w.notna()
    tw = float(w[mask].sum())
    if tw == 0.0:
        return None
    return float((x[mask] * w[mask]).sum() / tw)


def weighted_mean_native(x: Column | str, w: Column | str) -> Column:
    """The codegen twin of :func:`weighted_mean_pandas` — prefer this."""
    xc = F.col(x) if isinstance(x, str) else x
    wc = F.col(w) if isinstance(w, str) else w
    both = xc.isNotNull() & wc.isNotNull()
    num = F.sum(F.when(both, xc * wc))
    den = F.sum(F.when(both, wc))
    return num / F.nullif(den, F.lit(0.0))


# ------------------------------------------------------- UDTF: chunking

class ChunkDocument:
    """Python UDTF (§2.10's table-function shape): split a document
    into fixed-size word-window chunks with ordinals — the
    context-window chunking step of a training pipeline, one input row
    → N output rows.

    Register with ``spark.udtf.register("chunk_document",
    chunk_document_udtf())`` and call laterally::

        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM docs d, LATERAL chunk_document(d.text, 64) c

    ASCII-whitespace word splitting — deliberately ``re.ASCII``, not
    ``str.split()``, so the boundary set matches Java's ``\\s`` class
    and the native twin chunks identically on Unicode text (NBSP and
    friends are word characters in both). Python-side per-row eval is
    the cost of the UDTF surface — for chunking specifically a native
    equivalent exists (``sequence`` + ``slice`` over ``split``), and
    the parity test pins both to the same output. ``max_words <= 0``
    raises in both forms.
    """

    def eval(self, text: str, max_words: int):
        if max_words is not None and max_words <= 0:
            raise ValueError("max_words must be positive")
        if text is None or max_words is None:
            return
        import re

        words = [w for w in re.split(r"\s+", text, flags=re.ASCII) if w]
        for i in range(0, len(words), max_words):
            yield i // max_words, " ".join(words[i : i + max_words])


def chunk_document_udtf():
    """The decorated UDTF class (deferred: ``@udtf`` needs an active
    SparkSession-adjacent environment only at registration time)."""
    from pyspark.sql.functions import udtf

    return udtf(ChunkDocument, returnType="chunk_idx int, chunk string")


def chunk_native(text: Column | str, max_words: int) -> Column:
    """Native twin of :class:`ChunkDocument`: array of chunk strings
    (``posexplode`` it for ordinals). sequence+slice over the word
    array — stays in codegen, no Python."""
    if max_words <= 0:
        raise ValueError("max_words must be positive")
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(c, r"\s+"), lambda x: x != "")
    n = F.size(words)
    starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(max_words))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        starts, lambda s: F.array_join(F.slice(words, s, max_words), " ")
    )


# ------------------------------------------- unicode normalization

@pandas_udf(T.StringType())
def _nfkc_pandas(text: pd.Series) -> pd.Series:
    import unicodedata

    return text.map(
        lambda t: unicodedata.normalize("NFKC", t) if t is not None else None
    )


@pandas_udf(T.StringType())
def _nfc_pandas(text: pd.Series) -> pd.Series:
    import unicodedata

    return text.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def normalize_unicode(col: Column | str, form: str = "NFKC") -> Column:
    """Unicode canonical/compatibility normalization (Arrow-batched).

    The pre-dedup step ``functions/text.clean_text`` cannot do
    natively: composed vs decomposed accents (é vs e+◌́), ligatures
    (ﬁ → fi), full-width forms (Ａ → A) all hash differently while
    reading identically, splitting dedup/fingerprint groups. Spark has
    no built-in Unicode normalizer, so this is a justified pandas_udf
    (stdlib ``unicodedata`` over Arrow batches); NFKC for corpus
    hashing keys, NFC when compatibility folding is too lossy for the
    stored text. NULL-total.
    """
    c = F.col(col) if isinstance(col, str) else col
    if form == "NFKC":
        return _nfkc_pandas(c)
    if form == "NFC":
        return _nfc_pandas(c)
    raise ValueError(f"unsupported form {form!r}: use 'NFC' or 'NFKC'")


# ------------------------------------------- compression-based quality

_COMPRESSION_SIGNALS_TYPE = T.StructType(
    [
        T.StructField("ratio", T.DoubleType()),
        T.StructField("entropy", T.DoubleType()),
    ]
)


# StructType (not a DDL string) so the decorator never needs an active
# SparkSession at import time — DDL parsing goes through the JVM.
@pandas_udf(_COMPRESSION_SIGNALS_TYPE)
def compression_signals(text: pd.Series) -> pd.DataFrame:
    """Per-document compressibility signals (Arrow-batched):

    - ``ratio``: ``len(zlib(text)) / len(utf8(text))`` — repetitive or
      templated text compresses far below ~0.4; random/encrypted
      garbage sits near 1.0. The classic corpus-quality signal the
      Gopher/C4 family uses alongside the regex heuristics in
      ``functions/text.py``.
    - ``entropy``: character-level Shannon entropy in bits (0 for
      single-char runs, ~4.2 for ordinary English prose, ~6+ for
      base64/binary-ish spills).

    A genuine pandas_udf use: zlib and a histogram-entropy loop have
    no Catalyst expression, and the Arrow batch amortizes the Python
    boundary. NULL/empty texts yield NULL ratio and 0.0 entropy.
    """
    import math
    import zlib

    ratios, ents = [], []
    for t in text:
        if t is None or len(t) == 0:
            ratios.append(None)
            ents.append(0.0 if t is not None else None)
            continue
        raw = t.encode("utf-8")
        ratios.append(len(zlib.compress(raw, 6)) / len(raw))
        counts: dict[str, int] = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(t)
        ents.append(-sum(c / n * math.log2(c / n) for c in counts.values()))
    return pd.DataFrame({"ratio": ratios, "entropy": ents})
