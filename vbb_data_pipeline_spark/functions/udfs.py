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
