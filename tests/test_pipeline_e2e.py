"""End-to-end training-data pipeline over the fixture corpus — the
user story the operator library exists for, run as ONE session with
the between-stages release hook engaged:

  raw documents
    → PII scrub (pii_scrub)
    → exact-substring SPAN removal (substring_dedup_dropspans —
      earliest copy of every verbatim run survives)
    → SemDeDup semantic prune set (semantic_dedup → drop ids)
    → quality + exact-dedup + semantic corpus filter (corpus_filter)
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
from walrus_spark.operators.similarity import semantic_dedup
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

    # 3. semantic prune set (r12 — r11 verdict directive #7): SemDeDup
    # over the aligned embeddings table; the DROPPED ids (kept=false)
    # become corpus_filter's broadcast anti-join conjunct. vec_id and
    # doc_id share the fixture id space (TESTDATA.md), standing in for
    # the embedding-per-document join a production pipeline has.
    emb = load_table(spark, SF_DIR, "embeddings")
    verdicts = semantic_dedup(spark, emb)
    sem_drop = verdicts.where(~F.col("kept")).select(
        F.col("vec_id").alias("doc_id")
    )

    # 4. quality + exact-dedup + semantic keep-set (signals only —
    # re-attach the text via a semi-join on the keep ids, the
    # production shape)
    kept = corpus_filter(cleaned, min_tokens=5, semantic_drop=sem_drop)
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

    # stage 3/4: keep-set is deduplicated exactly — no two survivors
    # share a fingerprint
    n_kept = kept.count()
    assert 0 < n_kept <= n_raw
    n_fp = kept.select(F.md5(F.lower("text"))).distinct().count()
    assert n_fp == n_kept

    # the semantic conjunct actually bit: the fixture's replicated
    # embedding groups guarantee a nonempty prune set, none of whose
    # ids survive into the keep-set — and dropping the conjunct
    # (semantic_drop=None) re-admits at least one of them
    emb = load_table(spark, SF_DIR, "embeddings")
    sem_drop_ids = {
        r["vec_id"]
        for r in semantic_dedup(spark, emb)
        .where(~F.col("kept"))
        .collect()
    }
    assert sem_drop_ids
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert not (kept_ids & sem_drop_ids)
    from walrus_spark.operators.pipeline import corpus_filter as _cf

    no_sem_ids = {
        r["doc_id"]
        for r in _cf(cleaned, min_tokens=5).select("doc_id").collect()
    }
    assert no_sem_ids & sem_drop_ids

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
