"""End-to-end training-data pipeline over the fixture corpus — the
user story the operator library exists for, run as ONE session with
the between-stages release hook engaged:

  raw documents
    → PII scrub (pii_scrub)
    → exact-substring SPAN removal (substring_dedup_dropspans —
      earliest copy of every verbatim run survives)
    → quality + exact-dedup corpus filter (corpus_filter)
    → token accounting / packing offsets (seq_packing)
    → deterministic shuffle + shard assignment (shuffle_shards)

Each stage's output feeds the next as a real DataFrame (no
collect-and-recreate), invariants are asserted at every boundary, the
whole run is re-executed to prove end-to-end determinism, and after
release_session_caches the block manager must be empty — the stacked
multi-operator session shape the r6 capstone stressed, at test scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from walrus_spark.catalog import load_table
from walrus_spark.operators.dedup import substring_dedup_dropspans
from walrus_spark.operators.pipeline import (
    corpus_filter,
    seq_packing,
    shuffle_shards,
)
from walrus_spark.operators.text import pii_scrub
from walrus_spark.session import release_session_caches

from tests.conftest import SF_DIR


def _run_pipeline(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n_raw = docs.count()

    # 1. PII scrub — counters present, redaction applied
    scrubbed = pii_scrub(docs).select(
        "doc_id",
        F.col("text_scrubbed").alias("text"),
        "n_email",
        "n_ipv4",
        "n_phone",
    )

    # 2. span-level exact dedup (earliest copy wins)
    cleaned = substring_dedup_dropspans(
        scrubbed, window_tokens=8
    ).select("doc_id", F.col("text_clean").alias("text"))

    # 3. quality + exact-dedup keep-set (signals only — re-attach the
    # text via a semi-join on the keep ids, the production shape)
    kept = corpus_filter(cleaned, min_tokens=5)
    kept_docs = cleaned.join(
        kept.select("doc_id"), "doc_id", "leftsemi"
    )

    # 4. packing offsets over the surviving corpus
    packed = seq_packing(kept_docs)

    # 5. deterministic shuffle + shards
    sharded = shuffle_shards(kept_docs, n_shards=4)

    return n_raw, scrubbed, cleaned, kept_docs, packed, sharded


def test_training_data_pipeline_end_to_end(spark):
    n_raw, scrubbed, cleaned, kept, packed, sharded = _run_pipeline(spark)

    # stage 2: spans removed only ever SHRINK docs, and at least one
    # fixture near-dup pair actually loses tokens
    stats = (
        substring_dedup_dropspans(
            scrubbed, window_tokens=8
        )
        .agg(
            F.sum((F.col("n_tokens_removed") > 0).cast("long")).alias(
                "docs_touched"
            ),
            F.max("n_tokens_removed").alias("max_removed"),
            F.min(
                F.col("n_tokens") - F.col("n_tokens_removed")
            ).alias("min_left"),
        )
        .collect()[0]
    )
    assert stats["docs_touched"] > 0
    assert stats["min_left"] >= 0

    # stage 3: keep-set is deduplicated exactly — no two survivors
    # share a fingerprint
    n_kept = kept.count()
    assert 0 < n_kept <= n_raw
    n_fp = kept.select(F.md5(F.lower("text"))).distinct().count()
    assert n_fp == n_kept

    # stage 4: packing offsets are a correct exclusive prefix sum —
    # start_tok strictly ordered by doc_id, gaps equal token counts
    rows = packed.orderBy("doc_id").collect()
    run = 0
    for r in rows:
        assert r["start_tok"] == run, (r, run)
        run += r["n_tokens"]

    # stage 5: shards partition the keep-set, positions are contiguous
    # 1..len per shard
    srows = sharded.collect()
    assert len(srows) == n_kept
    by_shard: dict[int, list[int]] = {}
    for r in srows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))

    # end-to-end determinism: the whole pipeline reruns identically
    _, _, _, kept2, _, sharded2 = _run_pipeline(spark)
    assert kept2.count() == n_kept
    assert sorted(map(tuple, sharded2.collect())) == sorted(
        map(tuple, srows)
    )

    # stacked-session hygiene: after release, storage pool is empty
    release_session_caches(spark)
    assert (
        len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) == 0
    )
