"""Change-data-capture and incremental-load operators.

The reference's load path is append-plus-conflict-suppression
(``database_loader/operators.py:68-90``, ``utils/__init__.py:55-56``):
it detects NEW runs but never has to reconcile CHANGED rows, because a
GTFS run is immutable once landed. A 100 TB lakehouse pipeline does
have to reconcile: provider feeds get re-published with corrections,
dimension attributes drift, and downstream tables need either
latest-wins state (upsert) or full history (SCD type 2). These
operators supply that missing third leg of the load triangle:

* :func:`snapshot_diff` — what changed between two snapshots
  (insert / update / delete), computed without moving wide rows;
* :func:`merge_upsert` — MERGE ... WHEN MATCHED THEN UPDATE /
  WHEN NOT MATCHED THEN INSERT, as a pure DataFrame plan (Spark
  without a table format has no MERGE INTO);
* :func:`scd2_apply` — fold a snapshot into a type-2 slowly-changing
  dimension (close changed/deleted rows, open new versions).

Scale notes are per-operator; the common rule is that every operator
shuffles each input at most once, on the natural key, and comparison
happens on a map-side row hash so the exchange carries keys + 8-byte
hashes, never the wide payload, until the final targeted join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vbb_data_pipeline_spark.functions.hashing import md5_long, md5_long_pair


def _row_bytes(cols: Sequence[str]) -> Column:
    """Canonical self-delimiting encoding of a row's ``cols``.

    Each part is length-prefixed (``<len>:<value>``, NULL → ``n:``) —
    self-delimiting, so a value containing any separator/control
    character (or a literal sentinel string) cannot make two distinct
    rows collide across column boundaries, and NULL stays distinct
    from every real value including the empty string (``0:``).
    """
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("n:")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.concat(*parts)


def _row_hash(cols: Sequence[str], digest_bits: int = 64) -> Column:
    """Row digest over ``cols``: md5-derived int64
    (``functions/hashing.md5_long``) so the identical digest is
    computable in DuckDB for the oracle.

    ``digest_bits=64`` (default) is one 60-bit hash — right for test
    scale and DuckDB parity, but an 8-byte digest reaches ~50%
    birthday-collision probability around 2^32 ≈ 4×10⁹ DISTINCT rows
    sharing a key-space, inside the 100 TB design point; a collision
    silently suppresses a real update. ``digest_bits=128`` packs BOTH
    independent halves of the same single md5 evaluation
    (``md5_long_pair``) into a struct — collision probability at 10¹²
    rows is ~10⁻⁵ — at no extra md5 cost and +8 bytes on the exchange.
    Use 128 for tables beyond ~10⁸ rows.
    """
    enc = _row_bytes(cols)
    if digest_bits == 64:
        return md5_long(enc)
    if digest_bits == 128:
        h1, h2 = md5_long_pair(enc)
        return F.struct(h1.alias("h1"), h2.alias("h2"))
    raise ValueError(f"digest_bits must be 64 or 128, got {digest_bits}")


def _key_eq(left: str, right: str, keys: Sequence[str]) -> Column:
    """NULL-safe conjunction ``left.k <=> right.k`` over ``keys`` for
    alias-qualified joins; plain ``==`` would silently drop NULL-key
    rows from semi joins and leak them through anti joins."""
    cond = None
    for k in keys:
        c = F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}"))
        cond = c if cond is None else (cond & c)
    return cond


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    digest_bits: int = 64,
) -> DataFrame:
    """CDC diff of two snapshots of the same logical table.

    Returns ``keys + op`` where ``op ∈ {'insert','update','delete'}``;
    unchanged rows are dropped. ``insert`` = key only in ``new``,
    ``delete`` = key only in ``old``, ``update`` = key in both with a
    differing ``compare_cols`` digest.

    100 TB shape: each side is projected map-side to
    ``(keys, int64 digest)`` BEFORE the full-outer join, so the one
    shuffle per side carries ~16 bytes/row regardless of row width.
    The caller re-joins the ``op`` table to whichever side it needs
    payloads from (targeted, usually a small fraction of the table).

    Keys join NULL-safely (``eqNullSafe``): a row whose key contains
    NULL matches its counterpart instead of being reported as a
    simultaneous insert+delete.

    ``digest_bits``: see :func:`_row_hash` — 64 (DuckDB-parity
    default) or 128 (two-half md5 struct; use beyond ~10⁸ rows).
    """
    ks = list(keys)
    o = old.select(
        *ks, _row_hash(compare_cols, digest_bits).alias("_oh")
    ).alias("_o")
    n = new.select(
        *ks, _row_hash(compare_cols, digest_bits).alias("_nh")
    ).alias("_n")
    joined = o.join(n, _key_eq("_o", "_n", ks), "full_outer")
    # _oh/_nh are never NULL on a matched side (the digest itself is
    # total), so side presence is detected via the digests even when
    # key columns are legitimately NULL.
    op = (
        F.when(F.col("_oh").isNull(), F.lit("insert"))
        .when(F.col("_nh").isNull(), F.lit("delete"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("update"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_o.{k}"), F.col(f"_n.{k}")).alias(k)
                for k in ks
            ],
            "op",
        )
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Latest-wins MERGE: rows from ``updates`` replace same-key rows
    in ``target``; unmatched update rows are inserted; unmatched
    target rows survive. Equivalent to
    ``MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``.

    Plan: target left-anti updates (drop overwritten rows) unioned
    with updates — two hash exchanges on the key, no window, no wide
    sort. If ``updates`` may itself carry duplicate keys, pre-dedup it
    with :func:`latest_per_key` so the merge is deterministic.

    NULL-safe on the keys (``_key_eq``): the name-list anti join
    compiled to plain ``=``, so a NULL-key target row never matched
    its NULL-key update — the stale row LEAKED through the anti join
    and the update was inserted beside it, compounding duplicate-key
    state on every merge through merge_upsert_table.
    """
    ks = list(keys)
    t = target.alias("_t")
    u = updates.alias("_u")
    survivors = t.join(u, _key_eq("_t", "_u", ks), "left_anti")
    return survivors.unionByName(updates)


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Keep the single highest-``order_col`` row per key (ties broken
    by the full row digest for determinism). One shuffle on the key;
    ``max(struct(...))`` partial-aggregates map-side, so no window
    sort state and no skew from hot keys."""
    ks = list(keys)
    payload = [c for c in df.columns if c not in ks]
    packed = df.select(
        *ks,
        F.struct(
            F.col(order_col).alias("_ord"),
            _row_hash(payload).alias("_tie"),
            *[F.col(c) for c in payload],
        ).alias("_row"),
    )
    top = packed.groupBy(*ks).agg(F.max("_row").alias("_row"))
    return top.select(*ks, *[F.col(f"_row.{c}").alias(c) for c in payload])


#: Open-row sentinel for SCD2 ``valid_to``. Chosen inside pandas/
#: Arrow's timestamp[ns] range (max 2262-04-11): 9999-12-31 made every
#: ``toPandas()`` of a current dimension slice throw ArrowInvalid.
HIGH_TS = "2200-01-01 00:00:00"


def scd2_apply(
    dim: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    as_of: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    digest_bits: int = 64,
) -> DataFrame:
    """Fold one snapshot into a type-2 slowly-changing dimension.

    ``dim`` columns: ``keys + attr_cols + [valid_from, valid_to]``
    with current rows carrying ``valid_to = HIGH_TS``. ``snapshot``
    columns: ``keys + attr_cols`` observed at ``as_of`` (a timestamp
    literal string). The result is the updated dimension:

    * history rows (``valid_to != HIGH_TS``) pass through untouched;
    * current rows whose key vanished from the snapshot, or whose
      attributes changed, are CLOSED (``valid_to = as_of``);
    * changed and brand-new keys OPEN a row
      (``valid_from = as_of, valid_to = HIGH_TS``).

    Empty-diff idempotency: re-applying the same snapshot yields a
    bit-identical dimension. Plan: one full-outer join of the CURRENT
    slice vs the snapshot on the key (both sides digested map-side via
    the same ``(keys, hash)`` projection as :func:`snapshot_diff`),
    then two targeted joins to fetch payloads for the closed/opened
    slivers. History — the bulk of the table at 100 TB — is never
    shuffled at all; partition the stored dim by a ``valid_to``-derived
    flag so the current slice is a partition-pruned read.

    A NULL ``valid_to`` is treated as an open row (the other common
    SCD2 convention) rather than silently vanishing from both the
    history and current slices, which is what a plain ``!=``/``==``
    pair would do to it.
    """
    ks = list(keys)
    attrs = list(attr_cols)
    ts = F.to_timestamp(F.lit(as_of))
    high = F.to_timestamp(F.lit(HIGH_TS))

    is_open = F.coalesce(F.col(valid_to) == high, F.lit(True))
    history = dim.filter(~is_open)
    current = dim.filter(is_open).withColumn(valid_to, high)

    # The diff — changed keys only, small by CDC nature — feeds three
    # consumers (close / pass-through / open). Without materialization
    # each replays the full-outer digest join AND both snapshot scans
    # (measured: 9 scans, 12 exchanges, zero ReusedExchange in the
    # executed plan). localCheckpoint computes it once and truncates
    # lineage; deliberately NOT persist() — a persisted plan taxes
    # every later query in the session via CacheManager plan
    # comparison (see operators/dedup.jaccard_pairs).
    diff = snapshot_diff(
        current.select(*ks, *attrs),
        snapshot.select(*ks, *attrs),
        ks,
        attrs,
        digest_bits,
    ).localCheckpoint()
    # Semi/anti joins below must be NULL-safe like snapshot_diff's own
    # join: a key-name-list join compiles to plain `==`, so a NULL-key
    # dimension row would never match its diff entry — a changed/
    # deleted NULL-key row would stay open with stale attributes and an
    # inserted one would vanish from `opened`.
    changed = diff.filter(F.col("op").isin("update", "delete")).alias("_d")
    arrived = diff.filter(F.col("op").isin("update", "insert")).alias("_d")
    closed = (
        current.alias("_l")
        .join(changed, _key_eq("_l", "_d", ks), "left_semi")
        .withColumn(valid_to, ts)
    )
    untouched = current.alias("_l").join(
        changed, _key_eq("_l", "_d", ks), "left_anti"
    )
    opened = (
        snapshot.alias("_l")
        .join(arrived, _key_eq("_l", "_d", ks), "left_semi")
        .select(*ks, *attrs)
        .withColumn(valid_from, ts)
        .withColumn(valid_to, high)
    )
    return (
        history.unionByName(closed)
        .unionByName(untouched)
        .unionByName(opened)
    )
