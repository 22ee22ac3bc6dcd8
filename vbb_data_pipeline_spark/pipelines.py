"""End-to-end pipelines — the reference's three user-facing entry
points (SURVEY.md §3 E1/E2/E3) restated as engine calls.

The reference wires these through Airflow DAGs + XCom + Postgres +
a hand-built Kafka producer; here each is a pure function over
DataFrames so the "DAG" is the Catalyst plan. Orchestration concerns
(scheduling, retries) stay outside the engine (SURVEY.md §2.11).

* **E1 extract** (`gtfs_pipeline` DAG): landing scan → checksum dedup
  → new-run detection. Downloading itself is pre-engine (S3); the
  engine's job starts at the landed archive.
* **E2 load** (`database_load` DAG): per new run, zip → typed,
  lineage-stamped tables → conflict-ignoring append into the
  warehouse (the reference's ON CONFLICT DO NOTHING).
* **E3 arrivals** (`GtfsArrivalsProducer`): calendar→arrivals
  expansion → wire-format rows, ready for a Kafka sink
  (``sources/connectors.kafka_sink_spec``) or a paced replay
  (``streaming/arrivals.replay_paced``).
* **E4 corpus prep** (north-star extension, no reference analog):
  documents → profile → quality gate → exact + near dedup → split →
  mix → token-budget shards — the end-to-end training-data assembly
  flow composed from the extension operators.
* **E6 crawl corpus** (north-star extension): raw WARC archives →
  documents → URL hygiene (normalize / URL dedup / host cap / site
  boilerplate) → language ID → E4 — crawl-to-training-shards in one
  call, the C4/RefinedWeb construction shape over this engine's
  operators.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from vbb_data_pipeline_spark.operators.dedup import CKPT_SER
from vbb_data_pipeline_spark.operators.temporal import expand_arrivals
from vbb_data_pipeline_spark.sources.catalog import (
    assign_run_ids,
    dedup_archives,
    new_runs,
    scan_landing,
)
from vbb_data_pipeline_spark.sources.gtfs import (
    idempotent_append,
    read_gtfs_zip,
)
from vbb_data_pipeline_spark.streaming.arrivals import arrivals_as_wire


@dataclass
class Warehouse:
    """In-session stand-in for the reference's Postgres schema: one
    DataFrame per GTFS table plus the run catalog. At deployment these
    are parquet/bucketed tables (sources/layout.py) — the pipeline
    functions only ever union/anti-join, so the storage swap is a
    read/write at the edges."""

    tables: dict[str, DataFrame] = field(default_factory=dict)
    run_catalog: DataFrame | None = None


def e1_extract(spark: SparkSession, landing_dir: str, warehouse: Warehouse) -> DataFrame:
    """E1: landed archives that are genuinely new work.

    Checksum-dedup (XOR of member CRCs, distributed) drops
    re-downloads with identical content; the anti-join against the
    run catalog drops already-loaded runs. Returns
    ``(provider_id, run_date, path, checksum)``.
    """
    listing = scan_landing(spark, landing_dir)
    deduped = dedup_archives(spark, listing)
    if warehouse.run_catalog is None:
        return deduped
    return new_runs(deduped, warehouse.run_catalog)


def e2_load(
    spark: SparkSession, landing_dir: str, warehouse: Warehouse
) -> Warehouse:
    """E2: load every new run into the warehouse, idempotently.

    Run ids are deterministic (dense_rank over the natural key,
    offset by the catalog max — re-running assigns identical ids).
    Per-archive table reads are driver-coordinated (one archive is one
    zip — catalog-scale); the row data itself moves only through
    Spark plans.
    """
    pending = assign_run_ids(
        e1_extract(spark, landing_dir, warehouse), warehouse.run_catalog
    )
    # Materialize the pending list ONCE (it is catalog-scale metadata):
    # the checksum/anti-join/window chain runs a single time, and the
    # new catalog rows are rebuilt from the collected values so the
    # catalog never keeps lineage into the landing tree.
    runs = pending.select("run_id", "run_date", "provider_id", "path").collect()
    for r in sorted(runs, key=lambda x: x.run_id):
        for table, df in read_gtfs_zip(spark, r.path, r.run_id, r.provider_id).items():
            warehouse.tables[table] = idempotent_append(
                warehouse.tables.get(table), df, table
            )
    # Cut table lineage from the landing zips: retention may delete or
    # replace archives after load, and the warehouse must not
    # re-execute csv/zip reads on later evaluations. At deployment this
    # is the parquet write (sources/layout.py); in-session it is a
    # checkpoint.
    for table in list(warehouse.tables):
        warehouse.tables[table] = warehouse.tables[table].localCheckpoint()
    new_catalog = spark.createDataFrame(
        [(r.run_id, r.run_date, r.provider_id) for r in runs],
        "run_id int, run_date string, provider_id string",
    )
    warehouse.run_catalog = (
        new_catalog
        if warehouse.run_catalog is None
        else warehouse.run_catalog.unionByName(new_catalog)
    )
    return warehouse


def e3_arrivals(
    warehouse: Warehouse,
    start: dt.date,
    end: dt.date,
    as_wire: bool = False,
) -> DataFrame:
    """E3: the scheduled-arrivals stream the reference's producer
    replays — calendar ⋈ trips ⋈ stop_times ⋈ stops, expanded to
    concrete events, time-ordered. ``as_wire=True`` serializes to the
    producer's JSON wire shape (GtfsArrival.java:20-36), ready for
    ``kafka_sink_spec(...).save(df)``.
    """
    t = warehouse.tables
    out = expand_arrivals(
        t["calendar"], t["trips"], t["stop_times"], t["stops"], start, end
    )
    return arrivals_as_wire(out) if as_wire else out


def e4_corpus_prep(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    normalize: bool = False,
    redact: bool = False,
    line_dedup_min_chars: int | None = None,
    lm_band: tuple[float, float] | None = None,
    lm_vocab_size: int = 50_000,
    max_dup_line_frac: float | None = None,
    max_cross_dup_span_frac: float | None = None,
    remove_cross_dup_spans: bool = False,
    span_window: int = 15,
    span_winnow: int | None = 4,
    compression_bounds: tuple[float, float] | None = None,
    eval_df: DataFrame | None = None,
    eval_text_col: str = "text",
    decontam_min_matches: int = 5,
    jaccard_threshold: float = 0.8,
    lsh_max_bucket_size: int | None = None,
    lsh_pair_mode: str = "all",
    embedding_col: str | None = None,
    embedding_dim: int = 64,
    embedding_planes: int = 8,
    cosine_threshold: float = 0.9,
    split_weights: dict[str, float] | None = None,
    shard_budget: int = 50_000,
    pack_seq_len: int | None = None,
    pack_seq_shards: int = 8,
    mix_factors: dict[str, float] | None = None,
    mix_split: str = "train",
    epoch: int = 0,
    seed: str | int = 0,
    hash_mode: str | None = None,
) -> DataFrame:
    """E4: the training-corpus assembly pipeline — the north-star
    composition the reference never had, built entirely from this
    engine's operators:

    1. **Profile** — token count (BPE-ish) + heuristic quality score,
       one codegen pass over the scan.
    1b. **Hygiene** (optional) — ``normalize=True`` applies NFKC
       unicode normalization + control-char/whitespace cleanup first
       (``functions/udfs.normalize_unicode`` + ``text.clean_text``) so
       visually identical texts share dedup keys; ``redact=True``
       rewrites PII spans to placeholders BEFORE anything hashes the
       text (so dedup keys and shards see the redacted form);
       ``line_dedup_min_chars`` runs
       corpus-WIDE line dedup (the C4 construction,
       ``operators/dedup.line_dedup_corpus``) before profiling, so
       token counts, quality scores and every downstream hash see the
       boilerplate-stripped text; ``max_dup_line_frac`` drops
       documents whose duplicate-line fraction exceeds the cap (the
       Gopher repetition filter, ``functions/text.py``);
       ``max_cross_dup_span_frac`` drops documents whose
       CROSS-document duplicated-span fraction exceeds the cap unless
       they own (min-id) every duplicated span they hold
       (``operators/dedup.substring_span_stats``, Lee et al. 2021
       with winnowed fingerprint selection — catches long quoted runs
       that line dedup misses when line boundaries differ; the
       canonical first holder always survives);
       ``remove_cross_dup_spans=True`` is the SURGICAL alternative:
       instead of dropping span-heavy documents it excises the
       duplicated spans themselves (``operators/dedup.span_removal``,
       Lee et al.'s keep-one policy — the min-id owner keeps its
       copy, every other holder loses exactly the covered tokens),
       applied in the hygiene stage so all downstream profiling and
       hashing see the excised token stream;
       ``compression_bounds=(lo, hi)`` keeps only documents whose zlib
       compression ratio falls inside the band — below ``lo`` is
       repetitive/templated garbage, above ``hi`` is random/binary
       spill (``functions/udfs.compression_signals``; the one
       Arrow-batched Python stage in the pipeline, skipped entirely
       when the bound is None); ``lm_band=(lo_pct, hi_pct)`` applies
       the CCNet cut — self-train a unigram LM on the corpus
       (``operators/lm.py``) and keep only documents whose mean token
       log-prob falls between those score percentiles (0.0-1.0),
       dropping the far-from-corpus tail (garbage) and optionally the
       too-templated head.
    2. **Quality gate** — drop documents below ``min_quality``
       (C4/Gopher-style filtering).
    2b. **Decontamination** (when ``eval_df`` is given) — drop
       documents sharing ≥ ``decontam_min_matches`` word trigrams with
       the benchmark set (``operators/contamination.py``; eval grams
       broadcast, corpus text never shuffles).
    3. **Exact-ish dedup** — sorted-token-set fingerprint keep-lowest-id
       (one hash aggregation; wide columns never shuffle).
    4. **Near-dup removal** — MinHash → LSH banding → exact-Jaccard
       re-rank → connected components; every non-canonical cluster
       member (cluster_id ≠ doc id) is dropped. Linear-cost at 100 TB:
       no O(n²) stage anywhere (see operators/dedup.py). When
       ``embedding_col`` names a vector column on ``docs``, SEMANTIC
       near-dup pairs (hyperplane-LSH-blocked cosine strictly above
       ``cosine_threshold``) union with the text pairs before cluster
       assembly — paraphrases duplicate meaning without sharing
       shingles, and only the embedding signal catches them. Size
       ``embedding_planes`` to the corpus: the within-bucket join is
       quadratic per bucket, so 2^planes must keep buckets small.
       ``lsh_max_bucket_size`` is the degenerate-bucket backstop for
       BOTH candidate generators (MinHash bands and hyperplane
       buckets) — see ``operators/dedup.lsh_candidate_pairs``.
    5. **Split** — hash-deterministic train/val/test assignment, stable
       under corpus growth.
    6. **Mix** (optional) — epoch-aware weighted domain up/down-sampling
       of the ``mix_split`` split ONLY (train by default): re-weighting
       is a training-set operation — val/test must stay an unweighted
       sample of the corpus, so other splits pass through with
       ``copy_idx = 1``.
    7. **Pack** — greedy token-budget sharding per (split, lang): the
       physical training-shard layout, one window shuffle.
    7b. **Sequence plan** (optional, ``pack_seq_len``) — the
       concat-and-chunk packing plan per SPLIT
       (``operators/sampling.pack_sequences``, ``group_cols=
       ["split"]`` so no training sequence ever spans a split
       boundary): each output row additionally carries
       ``(seq_shard, seq_pos, start_off, end_off, first_seq,
       last_seq)`` — everything a per-shard token writer needs.

    Returns one row per packed document copy:
    ``(doc_id, lang, source, n_tokens, quality, split[, copy_idx],
    shard_id)``. Feed it to ``sources/layout.write_partitioned``
    partitioned by ``(split, shard_id)`` to land actual shard files.

    Every decision is deterministic (hash-membership, lowest-id
    survivors, fixed tie-breaks), so two runs — or two engines — agree
    row-for-row; ``tests/test_pipelines.py`` checks the composition
    end-to-end and stage-by-stage.
    """
    from vbb_data_pipeline_spark.functions.hashing import default_hash_mode
    from vbb_data_pipeline_spark.functions.text import bpe_token_count, quality_score
    from vbb_data_pipeline_spark.operators.dedup import (
        connected_components,
        fingerprint_dedup,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from vbb_data_pipeline_spark.operators.sampling import (
        deterministic_split,
        pack_token_shards,
        weighted_domain_mix,
    )
    from pyspark.sql import functions as F

    mode = hash_mode or default_hash_mode()
    weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}

    if normalize:
        # NFKC + control-char/whitespace cleanup FIRST: every
        # downstream hash (fingerprints, MinHash shingles, line
        # hashes) must see the normalized form or visually identical
        # texts land in different dedup groups
        from vbb_data_pipeline_spark.functions.text import clean_text
        from vbb_data_pipeline_spark.functions.udfs import normalize_unicode

        docs = docs.withColumn(
            text_col, clean_text(normalize_unicode(text_col))
        )
    if redact:
        from vbb_data_pipeline_spark.functions.text import redact_pii

        docs = docs.withColumn(text_col, redact_pii(text_col))
    if line_dedup_min_chars is not None:
        from vbb_data_pipeline_spark.operators.dedup import line_dedup_corpus

        deduped_text = line_dedup_corpus(
            docs.select(id_col, text_col),
            text_col,
            id_col,
            min_chars=line_dedup_min_chars,
        )
        docs = docs.drop(text_col).join(deduped_text, id_col)
    if remove_cross_dup_spans:
        from vbb_data_pipeline_spark.operators.dedup import span_removal

        # surgical Lee et al. removal (keep-one at the min-id owner)
        # instead of / before the coarser whole-document span gate;
        # runs in the hygiene stage so profiling, quality scores and
        # every downstream hash see the excised text. Stride-1 span
        # hashing (removal needs every duplicated position, so the
        # winnowed selection the ACCOUNTING gate uses does not apply).
        # Branches docs (hash side + rebuild side): truncate lineage
        # once, same rationale as the span-gate localCheckpoint below.
        docs = docs.localCheckpoint(storageLevel=CKPT_SER)
        rewritten = span_removal(
            docs.select(id_col, text_col),
            text_col,
            id_col,
            window=span_window,
            hash_mode=mode,
        ).select(id_col, text_col)
        docs = docs.drop(text_col).join(rewritten, id_col)
    profiled = docs.withColumn("n_tokens", bpe_token_count(text_col)).withColumn(
        "quality", quality_score(text_col)
    )
    kept = profiled.filter(F.col("quality") >= F.lit(min_quality))
    if max_dup_line_frac is not None:
        from vbb_data_pipeline_spark.functions.text import dup_line_fraction

        kept = kept.filter(
            dup_line_fraction(text_col) <= F.lit(float(max_dup_line_frac))
        )
    if max_cross_dup_span_frac is not None:
        from vbb_data_pipeline_spark.operators.dedup import (
            substring_span_stats,
        )

        # the gate BRANCHES from `kept` (span stats + the anti-join
        # back onto it), so without truncation the expensive upstream
        # lineage (Arrow NFKC, line-dedup shuffles) re-executes once
        # per consumer — measured 275 s vs 120 s at sf1. One
        # localCheckpoint computes it once; downstream stages (LM
        # band, MinHash) inherit the truncated lineage too.
        kept = kept.localCheckpoint(storageLevel=CKPT_SER)
        span_stats = substring_span_stats(
            kept.select(id_col, text_col),
            text_col,
            id_col,
            window=span_window,
            winnow=span_winnow,
            hash_mode=mode,
        )
        # drop span-heavy documents UNLESS they are the min-id owner
        # of every duplicated span they hold (the canonical first
        # holder survives; later quoters of its content do not)
        heavy_nonowner = span_stats.filter(
            (F.col("dup_frac") > F.lit(float(max_cross_dup_span_frac)))
            & (F.col("owned_dup_spans") < F.col("dup_spans"))
        ).select(id_col)
        kept = kept.join(heavy_nonowner, id_col, "left_anti")
    if compression_bounds is not None:
        from vbb_data_pipeline_spark.functions.udfs import compression_signals

        lo, hi = compression_bounds
        ratio = compression_signals(F.col(text_col)).getField("ratio")
        kept = kept.filter(ratio.between(F.lit(float(lo)), F.lit(float(hi))))
    if lm_band is not None:
        from vbb_data_pipeline_spark.operators.lm import lm_quality_scores

        lo_pct, hi_pct = lm_band
        scores = lm_quality_scores(
            kept.select(id_col, text_col), text_col, id_col,
            vocab_size=lm_vocab_size,
        ).select(id_col, "lm_score")
        # two corpus-level scalars (the band edges) — model metadata,
        # like the unigram totals themselves
        edges = scores.agg(
            F.percentile("lm_score", F.lit(float(lo_pct))).alias("lo"),
            F.percentile("lm_score", F.lit(float(hi_pct))).alias("hi"),
        ).collect()[0]
        in_band = scores.filter(
            F.col("lm_score").between(F.lit(edges.lo), F.lit(edges.hi))
        ).select(id_col)
        kept = kept.join(in_band, id_col, "left_semi")
    if eval_df is not None:
        from vbb_data_pipeline_spark.operators.contamination import decontaminate

        kept = decontaminate(
            kept,
            eval_df,
            doc_id_col=id_col,
            doc_text_col=text_col,
            eval_text_col=eval_text_col,
            min_matches=decontam_min_matches,
            hash_mode=mode,
        )
    exact = fingerprint_dedup(kept, text_col, id_col)

    sigs = minhash_signatures(exact, text_col, id_col, hash_mode=mode)
    cands = lsh_candidate_pairs(
        sigs, id_col, hash_mode=mode, max_bucket_size=lsh_max_bucket_size,
        pair_mode=lsh_pair_mode,
    )
    near = jaccard_pairs(exact, cands, text_col, id_col, hash_mode=mode).filter(
        F.col("jaccard") >= F.lit(jaccard_threshold)
    ).select("id_a", "id_b")
    if embedding_col is not None:
        from vbb_data_pipeline_spark.operators.similarity import (
            embedding_neardup_pairs,
        )

        semantic = embedding_neardup_pairs(
            exact.select(id_col, embedding_col),
            dim=embedding_dim,
            num_planes=embedding_planes,
            threshold=cosine_threshold,
            id_col=id_col,
            vec_col=embedding_col,
            max_bucket_size=lsh_max_bucket_size,
        ).select("id_a", "id_b")
        near = near.unionByName(semantic).distinct()
        # the vector served its purpose: don't ship ~dim*8 bytes/row
        # through the split/mix/pack exchange and into the output
        exact = exact.drop(embedding_col)
    clusters = connected_components(near)
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    canonical = exact.join(losers, id_col, "left_anti")

    split = deterministic_split(
        canonical, id_col, weights, seed=seed, hash_mode=mode
    )
    if mix_factors:
        if mix_split not in weights:
            raise ValueError(
                f"mix_split {mix_split!r} is not a split name in {list(weights)}"
            )
        mixed = weighted_domain_mix(
            split.filter(F.col("split") == F.lit(mix_split)),
            "source",
            mix_factors,
            id_col,
            epoch=epoch,
            seed=seed,
            hash_mode=mode,
        )
        rest = split.filter(F.col("split") != F.lit(mix_split)).withColumn(
            "copy_idx", F.lit(1).cast("long")
        )
        split = mixed.unionByName(rest)
    pack_order = [id_col, "copy_idx"] if mix_factors else [id_col]
    packed = pack_token_shards(
        split, ["split", "lang"], pack_order, "n_tokens", budget=shard_budget
    )
    if pack_seq_len is not None:
        # 8c. Sequence-packing plan per SPLIT (streams never cross a
        # split boundary — a val token inside a train sequence would
        # leak). Key = (id, copy_idx) when epoch mixing duplicated
        # rows; the plan columns ride on the output so the token
        # writer is one per-(split, seq_shard) pass.
        from vbb_data_pipeline_spark.operators.sampling import pack_sequences

        if mix_factors:
            packed = packed.withColumn(
                "_seq_key",
                F.concat_ws("#", F.col(id_col).cast("string"),
                            F.col("copy_idx").cast("string")),
            )
            skey = "_seq_key"
        else:
            skey = id_col
        packed = (
            pack_sequences(
                packed, skey, "n_tokens", seq_len=pack_seq_len,
                n_shards=pack_seq_shards, seed=seed, hash_mode=hash_mode,
                group_cols=["split"],
            )
            .withColumnRenamed("shard", "seq_shard")
            .withColumnRenamed("pos", "seq_pos")
        )
        if mix_factors:
            packed = packed.drop("_seq_key")
    return packed.drop(text_col)


def e6_crawl_corpus(
    spark: SparkSession,
    warc_path: str,
    *,
    url_dedup: bool = True,
    input_format: str = "warc",
    extractor: str = "density",
    max_per_host: int | None = None,
    host_cap_mode: str = "exact",
    boilerplate_min_docs: int | None = None,
    langs: tuple[str, ...] | None = None,
    min_chars: int = 1,
    seed: str | int = 0,
    hash_mode: str | None = None,
    run_e4: bool = True,
    lsh_pair_mode: str = "star",
    ranged_chunk_bytes: int | None = None,
    materialize_dir: str | None = None,
    resume: bool = False,
    **e4_kwargs,
) -> DataFrame:
    """E6: raw crawl archives → training shards, the full C4/RefinedWeb
    construction shape (URL-level curation BEFORE content-level
    curation) composed from this engine's operators:

    1. **Ingest** — ``sources/warc.read_warc`` (one file = one task,
       the crawl parallelism model) → ``warc_to_documents`` (200-status
       HTML → text, deterministic 60-bit doc ids). ``extractor``
       selects the HTML tier: ``"naive"`` (all visible text) or
       ``"density"`` (block word-count/link-density boilerplate
       classification — higher body-text precision, same Arrow stage).
       ``input_format="wet"`` starts from Common Crawl's pre-extracted
       text distribution instead (``wet_to_documents`` — conversion
       records, no HTML stage at all; ``extractor`` is ignored).
    2. **URL normalize** — ``functions/urls.normalize_url`` canonical
       form (tracking params, fragments, default ports stripped);
       documents whose URL has no parseable host are dropped (crawl
       junk — non-http schemes, mangled URIs).
    3. **URL dedup** (``url_dedup=True``) — keep the min-doc-id fetch
       per canonical URL: re-crawls of the same page are the single
       biggest duplicate class in a multi-snapshot crawl, and URL
       identity removes them for the price of one window exchange
       before any text ever hashes.
    4. **Host cap** (``max_per_host``) — at most N documents per host,
       seeded-hash-chosen (``functions/urls.host_cap``), so no single
       domain dominates the corpus. ``host_cap_mode="approx"`` swaps
       in the windowless :func:`~vbb_data_pipeline_spark.functions.
       urls.host_cap_approx` (expected-N binomial cap) — the right
       choice when a mega-host would make the exact window's
       single-task partition a straggler.
    5. **Site boilerplate** (``boilerplate_min_docs``) — lines
       repeating across ≥ k documents of the same host are stripped
       (``functions/urls.site_boilerplate_removal``); documents left
       with fewer than ``min_chars`` text characters drop out.
    6. **Language ID** — ``lang`` column via the stopword-argmax
       heuristic (``functions/text.lang_guess``); ``langs`` keeps only
       those languages. ``source`` is the URL host — the natural
       domain key for E4's ``mix_factors`` re-weighting.
    7. **E4** — everything else (quality gates, exact/near/semantic
       dedup, decontamination, split/mix/pack) is a pass-through to
       :func:`e4_corpus_prep` via ``**e4_kwargs``.

    The document set is ``localCheckpoint``-ed once after curation:
    the WARC parse + HTML extraction is the most expensive Arrow stage
    in the whole flow and E4 branches its input repeatedly (span
    stats, LM scores, decontamination, MinHash all fan out from the
    same frame) — without truncation the crawl would re-parse once per
    branch (the measured E4 lineage lesson, 275→120 s at sf1).

    Returns E4's packed rows, with ``url`` riding along for
    traceability. Deterministic end-to-end: ids, URL winners, host
    caps and every E4 decision are seeded hashes, so two runs — or a
    resumed run — produce identical shards.

    **Resume** (``resume=True``, requires ``materialize_dir``): if the
    directory already holds a COMMITTED curated-documents frame from a
    prior run of the same configuration (the ``_e6_curation.json``
    marker, written only after the parquet commit, records every
    parameter that shapes steps 1–6), the WARC parse + curation is
    skipped entirely and E4 restarts from the at-rest frame. At 100 TB
    the ingest/curation pass is hours of work a mid-E4 failure should
    not repeat; determinism makes the resumed run's shards identical
    to an uninterrupted one. A marker from a DIFFERENT configuration
    raises (never silently reuses the wrong corpus); a missing marker
    falls through to a fresh run — so crash-restart scripts can pass
    ``resume=True`` unconditionally. All probes go through the Hadoop
    FileSystem API (portable to hdfs/s3a, not driver-local).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from vbb_data_pipeline_spark.functions.text import lang_guess
    from vbb_data_pipeline_spark.functions.urls import (
        host_cap,
        host_cap_approx,
        normalize_url,
        site_boilerplate_removal,
        url_host,
    )
    from vbb_data_pipeline_spark.sources.warc import (
        read_warc,
        read_warc_ranged,
        warc_to_documents,
        wet_to_documents,
    )

    if input_format not in ("warc", "wet"):
        raise ValueError(f"input_format must be warc|wet: {input_format}")

    # every parameter that shapes the curated frame (steps 1-6); the
    # resume marker must match ALL of them before the at-rest frame
    # can stand in for a fresh curation pass. ranged_chunk_bytes is
    # deliberately absent: the ranged tier is byte-identical to the
    # whole-file read (parity-tested), so it never invalidates a
    # resume.
    import json as _json

    from vbb_data_pipeline_spark.functions.hashing import default_hash_mode

    curation_conf = {
        "warc_path": warc_path,
        "input_format": input_format,
        # the WET path never consults the extractor (conversion
        # records are pre-extracted) — normalize it out of the marker
        # so a restart that spells it differently doesn't force a
        # spurious re-curation
        "extractor": extractor if input_format == "warc" else None,
        "url_dedup": url_dedup,
        "max_per_host": max_per_host,
        "host_cap_mode": host_cap_mode,
        "boilerplate_min_docs": boilerplate_min_docs,
        "langs": list(langs) if langs is not None else None,
        "min_chars": min_chars,
        "seed": str(seed),
        # RESOLVED mode: hash_mode=None resolves through the
        # environment (default_hash_mode), and a resume in a
        # different environment must not silently reuse a frame whose
        # per-host winners were elected under the other hash family
        "hash_mode": hash_mode or default_hash_mode(),
    }
    marker = (
        materialize_dir.rstrip("/") + "/_e6_curation.json"
        if materialize_dir is not None
        else None
    )
    if resume:
        from vbb_data_pipeline_spark.sources.layout import (
            hadoop_exists,
            hadoop_read_text,
        )

        if materialize_dir is None:
            raise ValueError("resume=True requires materialize_dir")
        if hadoop_exists(spark, marker):
            recorded = _json.loads(hadoop_read_text(spark, marker))
            # legacy-marker tolerance (mirrors crawl_e2e's optional
            # 'sf'): markers written before hash_mode/extractor were
            # RESOLVED into the record carry hash_mode null (meaning
            # "the environment default AT WRITE TIME") and, on WET
            # runs, whatever extractor string the caller passed even
            # though the WET path never consults it. Normalizing null
            # to the CURRENT default is only sound when the recorded
            # run never consulted the hash at all — inside curation
            # that is exclusively the host cap (url_dedup elects
            # winners by min doc_id, hash-free) — because the writing
            # environment's default is unknowable here, and resuming
            # a frame whose per-host winners were elected under the
            # other hash family is the exact silent reuse the
            # resolved record exists to prevent.
            if recorded.get("hash_mode") is None:
                if recorded.get("max_per_host") is None:
                    recorded["hash_mode"] = default_hash_mode()
                else:
                    raise ValueError(
                        f"resume: the marker at {marker} predates "
                        "hash_mode resolution (records null) and its "
                        "run used max_per_host, so the hash family "
                        "that elected the per-host winners is "
                        "unknowable. Re-curate with resume=False (or "
                        "a fresh materialize_dir); if the original "
                        "environment's hash mode is known, rewrite "
                        "the marker's hash_mode to it explicitly."
                    )
            if recorded.get("input_format") == "wet":
                recorded["extractor"] = None
            if recorded != curation_conf:
                diff = sorted(
                    k
                    for k in curation_conf
                    if recorded.get(k) != curation_conf[k]
                )
                raise ValueError(
                    f"resume: {materialize_dir} holds curated documents "
                    f"from a different configuration (mismatched: {diff}); "
                    "pass resume=False (or a fresh materialize_dir) to "
                    "re-curate"
                )
            docs = spark.read.parquet(materialize_dir)
            if not run_e4:
                return docs
            return e4_corpus_prep(
                docs,
                seed=seed,
                hash_mode=hash_mode,
                lsh_pair_mode=lsh_pair_mode,
                **e4_kwargs,
            )
        # no marker -> nothing committed to resume from: fresh run

    # ranged_chunk_bytes: opt into the byte-range tier when archives
    # exceed the per-task heap (binaryFile holds the WHOLE file in JVM
    # memory — the measured 10 GB-decade OOM; sources/warc.py header)
    def _read(types=("response",)):
        if ranged_chunk_bytes is not None:
            return read_warc_ranged(
                spark, warc_path, types=types,
                chunk_bytes=ranged_chunk_bytes,
            )
        return read_warc(spark, warc_path, types=types)

    if input_format == "warc":
        docs = warc_to_documents(_read(), extractor=extractor)
    else:  # "wet" — validated above
        docs = wet_to_documents(_read(types=("conversion",)))
    docs = docs.withColumn("url", normalize_url("url")).filter(
        url_host("url").isNotNull()
    )
    if url_dedup:
        w = Window.partitionBy("url").orderBy(F.col("doc_id").asc())
        docs = (
            docs.withColumn("_u_rn", F.row_number().over(w))
            .filter(F.col("_u_rn") == 1)
            .drop("_u_rn")
        )
    if max_per_host is not None:
        if host_cap_mode not in ("exact", "approx"):
            raise ValueError(
                f"host_cap_mode must be 'exact' or 'approx', "
                f"got {host_cap_mode!r}"
            )
        capper = host_cap if host_cap_mode == "exact" else host_cap_approx
        docs = capper(
            docs, "url", max_per_host, seed=f"e6hostcap|{seed}",
            hash_mode=hash_mode,
        )
    if boilerplate_min_docs is not None:
        docs = site_boilerplate_removal(
            docs, "url", "text", "doc_id", min_docs=boilerplate_min_docs
        )
    docs = docs.filter(F.length("text") >= F.lit(min_chars))
    docs = docs.select(
        "doc_id",
        "url",
        lang_guess("text").alias("lang"),
        F.coalesce(url_host("url"), F.lit("unknown")).alias("source"),
        "text",
    )
    if langs is not None:
        docs = docs.filter(F.col("lang").isin(list(langs)))
    if not run_e4 and materialize_dir is None:
        # curated documents only (steps 1-6) — the URL-level plane, a
        # measurement/inspection surface (tools/crawl_throughput.py)
        # and the hand-off point for callers running their own corpus
        # assembly; no checkpoint since nothing fans out from here
        return docs
    if materialize_dir is not None:
        # AT-REST hand-off: write the curated documents to parquet and
        # re-read. localCheckpoint pins its blocks in the storage
        # region (they are the only copy, so they can NEVER be
        # evicted) — at the 10 GB/25M-doc decade that pinned frame
        # starved execution memory mid-E4 (measured:
        # UNABLE_TO_ACQUIRE_MEMORY at 0.5 GB/task, CRAWL_E2E.json).
        # Parquet truncates lineage with ZERO storage pinning, E4's
        # branches re-read with column pruning, and it is the only
        # shape that exists at 100 TB anyway.
        from vbb_data_pipeline_spark.sources.layout import hadoop_write_text

        docs.write.mode("overwrite").parquet(materialize_dir)
        # marker AFTER the parquet commit: its presence is the resume
        # contract ("this directory holds a complete curated frame of
        # exactly this configuration"). Underscore prefix keeps it
        # invisible to the parquet reader.
        hadoop_write_text(
            spark, marker, _json.dumps(curation_conf, sort_keys=True)
        )
        docs = spark.read.parquet(materialize_dir)
        if not run_e4:
            # curate-once hand-off: the at-rest frame plus its marker
            # are the whole point of a curation-only materialized run —
            # a later resume=True (with or without E4) starts from here
            # instead of re-running the WARC parse
            return docs
    else:
        docs = docs.localCheckpoint(storageLevel=CKPT_SER)
    # crawl corpora carry mega-families of near-identical pages
    # (mirrors, templates, re-crawl variants): star-edge candidate
    # generation (lsh_pair_mode="star", an explicit E6 parameter
    # because it trades recall — a member below-threshold vs its
    # bucket hub detaches even if near another member) keeps the
    # near-dup tier linear per LSH bucket — measured: the 1 GB /
    # 500-variant-family corpus OOMs 0.5 GB/task executors in "all"
    # mode (~2.5e9 candidate rows) and completes in "star"; the
    # measured recall delta on a mixed near-threshold corpus is in
    # PERF.md (star-mode recall table).
    return e4_corpus_prep(
        docs,
        seed=seed,
        hash_mode=hash_mode,
        lsh_pair_mode=lsh_pair_mode,
        **e4_kwargs,
    )
