"""Exact-substring dedup (operators/dedup.py substring_dedup_pairs):
pinned against a literal python oracle (brute-force longest common
token run) on planted corpora, plus edge cases and a plan-shape
assertion (no row-Python; banded candidates then exact verify)."""

from __future__ import annotations

import pandas as pd
import pytest

from walrus_spark.operators.dedup import (
    substring_dedup_dropspans,
    substring_dedup_pairs,
)


def _py_oracle(docs: dict[int, str], w: int):
    """Brute force: for every pair, all aligned shared w-token windows
    and the longest common consecutive-token run."""
    toks = {k: v.lower().split() for k, v in docs.items()}
    out = {}
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ta, tb = toks[a], toks[b]
            shared = 0
            best = 0
            for i in range(len(ta) - w + 1):
                for j in range(len(tb) - w + 1):
                    if ta[i : i + w] == tb[j : j + w]:
                        shared += 1
                        run = w
                        while (
                            i + run < len(ta)
                            and j + run < len(tb)
                            and ta[i + run] == tb[j + run]
                        ):
                            run += 1
                        best = max(best, run)
            if shared:
                out[(a, b)] = (shared, best)
    return out


def _run(spark, docs: dict[int, str], w: int = 4):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(docs), "text": [docs[k] for k in docs]}
        )
    )
    rows = substring_dedup_pairs(df, window_tokens=w).collect()
    return {
        (r["doc_a"], r["doc_b"]): (
            r["n_shared_windows"],
            r["max_run_tokens"],
        )
        for r in rows
    }


def test_substring_pairs_match_python_oracle(spark):
    quote = "the quick brown fox jumps over the lazy dog tonight"
    docs = {
        1: f"alpha beta {quote} gamma delta epsilon",
        2: f"unrelated words here {quote} and completely different tail",
        3: "no overlap with anything else at all in this one document",
        4: f"alpha beta {quote} gamma delta epsilon",  # identical to 1
        5: "the quick brown fox sentence fragment only",  # < window run
    }
    w = 6
    got = _run(spark, docs, w)
    want = _py_oracle(docs, w)
    assert got == want
    # the planted 10-token quote is found between the non-identical docs
    assert got[(1, 2)][1] >= 10
    # identical docs: the full doc is the run
    n_tokens = len(docs[1].split())
    assert got[(1, 4)] == (n_tokens - w + 1, n_tokens)
    # doc 3 pairs with nothing; doc 5's 4-token overlap < w stays out
    assert not any(3 in p for p in got)
    assert not any(5 in p for p in got)


def test_substring_pairs_edge_cases(spark):
    docs = {
        1: "a b c",  # shorter than the window -> no windows
        2: "a b c",
        3: "x " * 50,  # internal repeats must not self-pair
        4: "y y y y y y y y y y",
        5: "",  # empty
    }
    got = _run(spark, docs, w=4)
    want = _py_oracle(docs, w=4)
    assert got == want
    assert (1, 2) not in got  # both below window size
    assert not any(5 in p for p in got)


def test_substring_pairs_multiple_separate_runs(spark):
    """Two disjoint shared runs must NOT chain into one: the diagonal
    gaps-and-islands logic keeps them separate and max_run_tokens is
    the longer one, n_shared_windows the sum."""
    run1 = "one two three four five six"
    run2 = "red orange yellow green blue purple pink"
    docs = {
        1: f"{run1} FILLER1 mid words {run2} tail",
        2: f"{run2} OTHER stuff between {run1} end bits",
    }
    w = 4
    got = _run(spark, docs, w)
    want = _py_oracle(docs, w)
    assert got == want
    assert got[(1, 2)][1] == 7  # the 7-token run2, not a merged chain


def test_substring_pairs_plan_shape(spark):
    docs = {i: f"doc {i} shares common run tokens here {i}" for i in range(6)}
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    out = substring_dedup_pairs(df, window_tokens=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    out.collect()


@pytest.mark.slow
def test_substring_pairs_on_fixture_corpus(spark, sf_dir):
    """Runs on the real documents fixture: result is deterministic
    across two executions and every reported pair genuinely shares a
    window (spot-verified in python for a sample)."""
    from walrus_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out1 = {
        (r["doc_a"], r["doc_b"]): (r["n_shared_windows"], r["max_run_tokens"])
        for r in substring_dedup_pairs(docs, window_tokens=8).collect()
    }
    out2 = {
        (r["doc_a"], r["doc_b"]): (r["n_shared_windows"], r["max_run_tokens"])
        for r in substring_dedup_pairs(docs, window_tokens=8).collect()
    }
    assert out1 == out2
    texts = {
        r["doc_id"]: r["text"].lower().split()
        for r in docs.select("doc_id", "text").collect()
    }
    for (a, b), (_n, run) in list(sorted(out1.items()))[:10]:
        ta, tb = texts[a], texts[b]
        joined_b = " ".join(tb)
        found = any(
            " ".join(ta[i : i + 8]) in joined_b
            for i in range(len(ta) - 7)
        )
        assert found, (a, b)
        assert run >= 8


def test_substring_pairs_random_corpus_vs_oracle(spark):
    """Randomized corpus from a tiny vocabulary (dense window
    collisions, partial overlaps, repeated tokens) vs the brute-force
    oracle — the property-style sweep in one Spark job."""
    import random

    rnd = random.Random(0xD0C5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = {}
    for i in range(18):
        n = rnd.randrange(0, 30)
        docs[i] = " ".join(rnd.choice(vocab) for _ in range(n))
    # plant one guaranteed long shared run between two random docs
    run = "p q r s t u v w"
    docs[100] = f"{docs[3]} {run}"
    docs[101] = f"{run} {docs[7]}"
    for w in (3, 5):
        got = _run(spark, docs, w)
        want = _py_oracle(docs, w)
        assert got == want, (w, {
            k: (got.get(k), want.get(k))
            for k in set(got) ^ set(want) | {
                k for k in got if got[k] != want.get(k)
            }
        })


def _py_dropspans(docs: dict[int, str], w: int):
    """Brute-force span removal: for each doc, remove every token
    position covered by a w-window run also present at some aligned
    position in an EARLIER doc (lower id) — the earliest copy
    survives. Mirrors the operator's policy exactly."""
    import re

    toks = {
        k: re.sub(r"\s+", " ", v.lower().strip()).split(" ")
        for k, v in docs.items()
    }
    removed: dict[int, set[int]] = {k: set() for k in docs}
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ta, tb = toks[a], toks[b]
            for i in range(len(ta) - w + 1):
                for j in range(len(tb) - w + 1):
                    if ta[i : i + w] == tb[j : j + w]:
                        removed[b].update(range(j, j + w))
    out = {}
    for k in ids:
        kept = [
            t for i, t in enumerate(toks[k]) if i not in removed[k]
        ]
        out[k] = (len(toks[k]), len(removed[k]), " ".join(kept))
    return out


def test_substring_dropspans_matches_python_oracle(spark):
    """substring_dedup_dropspans vs the brute-force removal policy:
    exact text_clean equality (not just counts), transitive
    earliest-copy-wins (1 < 2 < 3 sharing one span -> only doc 1
    keeps it), untouched docs pass through verbatim."""
    from walrus_spark.operators.dedup import substring_dedup_dropspans

    run = "p q r s t u v w x"
    docs = {
        1: f"alpha beta {run} gamma delta",
        2: f"{run} completely different tail here",
        3: f"front matter {run}",
        4: "no shared content in this document at all",
        5: "",
    }
    w = 4
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_tokens_removed"],
            r["text_clean"],
        )
        for r in substring_dedup_dropspans(
            _df(spark, docs), window_tokens=w
        ).collect()
    }
    want = _py_dropspans(docs, w)
    assert got == want, (got, want)
    # the span survives ONLY in doc 1
    assert run in got[1][2]
    assert run not in got[2][2] and run not in got[3][2]
    # untouched docs unchanged (normalized form)
    assert got[4] == (8, 0, docs[4])


def _df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(docs), "text": [docs[k] for k in docs]}
        )
    )


def test_substring_dropspans_random_corpus(spark):
    """Randomized agreement with the brute force on a corpus with
    planted cliques and overlapping spans across 3+ docs."""
    import random

    rnd = random.Random(0xBEEF)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = {}
    for i in range(14):
        docs[i] = " ".join(
            rnd.choice(vocab) for _ in range(rnd.randrange(0, 25))
        )
    run = "r1 r2 r3 r4 r5 r6"
    docs[50] = f"{docs[2]} {run}"
    docs[51] = f"{run} {docs[5]} {run}"
    docs[52] = f"mid {run} mid"
    for w in (3, 5):
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["n_tokens_removed"],
                r["text_clean"],
            )
            for r in substring_dedup_dropspans(
                _df(spark, docs), window_tokens=w
            ).collect()
        }
        want = _py_dropspans(docs, w)
        assert got == want, (w,)
