#!/usr/bin/env python
"""Derive a larger scale factor from a driver fixture dir,
DETERMINISTICALLY (r9 verdict directive #1a: the 2x bench gate needs a
same-window pair at a scale where per-entry compute dwarfs the
~0.3-0.5 s scheduling floor, and the sandbox only ships sf<=0.1).

K replicas of every table, replica 0 verbatim, keys shifted by
replica * (max_key + 1) so foreign keys stay within-replica and every
per-replica answer is the source answer — aggregate workload scales
exactly K x with the source's distributions intact:

  * documents: every WORD in replica k>0 gets a '~k' suffix, so
    replicas share no shingles/terms — near-dup structure (pairs,
    clusters, substring runs) replicates K x instead of exploding
    quadratically across replicas (10 identical copies of each doc
    would manufacture C(10,2) artificial near-dup pairs per source
    doc, a workload shape the source SF doesn't have).
  * embeddings: replica k's vectors are the source vectors ROLLED by
    1 + (k*5) % 63 dimensions (never 0 mod the 64-dim vectors, so no
    replica aliases replica 0) — norms (and so per-vector work) are
    preserved,
    cross-replica cosine similarity decays to the random baseline, so
    the >=0.4-threshold pair workload also scales ~K x.
  * events: event_id/user_id shift per replica (each replica is an
    independent user population; sessionization/window answers
    replicate), timestamps unchanged (K x density, same span).
  * region/nation: fixed-size dimensions in TPC-H at every SF —
    copied verbatim, not replicated.

No randomness, no timestamps-of-now: rerunning the tool bit-identically
reproduces the dataset (DuckDB COPY is deterministic for a
deterministic query).

Usage: python tools/make_sf.py --src /root/testdata/sf0.1 \
           --dst /tmp/walrus_sf1 --k 10
"""

from __future__ import annotations

import argparse
import os

import duckdb

SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# which table's stride each shifted column uses (FKs shift together
# with the table they reference)
KEY_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

COPY_VERBATIM = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    # Embedding rolls live in 1..63 with stride 5 (coprime to 63), so
    # rolls are DISTINCT for k = 1..63; past 64 replicas two replicas
    # would share a roll and reintroduce manufactured cosine-1.0
    # cross-replica duplicate pairs (r11 advisor finding: the earlier
    # stride 7 had gcd(7, 63) = 7, i.e. period 9 — k and k+9 aliased).
    if args.k > 64:
        ap.error("--k must be <= 64: 64-dim embeddings admit only 63 "
                 "distinct nonzero rolls, so more replicas would alias")
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()

    strides: dict[tuple[str, str], int] = {}
    for col, (tab, keycol) in KEY_OWNER.items():
        if (tab, keycol) not in strides:
            strides[(tab, keycol)] = (
                con.execute(
                    f"SELECT max({keycol}) + 1 FROM "
                    f"'{args.src}/{tab}.parquet'"
                ).fetchone()[0]
            )

    for t in COPY_VERBATIM:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') TO "
            f"'{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied verbatim")

    for t, keys in SHIFT_KEYS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{args.src}/{t}.parquet'"
            ).fetchall()
        ]
        arms = []
        for k in range(args.k):
            sel = []
            for c in cols:
                if c in keys:
                    stride = strides[KEY_OWNER[c]]
                    sel.append(f"({c} + {k * stride}) AS {c}")
                elif t == "documents" and c == "text" and k > 0:
                    sel.append(
                        f"regexp_replace(text, '(\\S+)', '\\1~{k}', 'g')"
                        f" AS text"
                    )
                elif t == "documents" and c == "n_chars" and k > 0:
                    # n_chars == length(text) in the source (verified);
                    # keep the invariant on the suffixed text
                    sel.append(
                        f"length(regexp_replace(text, '(\\S+)', "
                        f"'\\1~{k}', 'g')) AS n_chars"
                    )
                elif t == "embeddings" and c == "embedding" and k > 0:
                    # roll in 1..63, NEVER 0 mod the vector dim: the
                    # old (k*7+1)%64 hit 0 at k=9, making the last
                    # replica's vectors IDENTICAL to replica 0's —
                    # one manufactured exact-duplicate (cosine 1.0)
                    # cross-replica pair per source vector, violating
                    # the decays-to-baseline invariant above (r10
                    # advisor finding). Stride 5 is coprime to 63
                    # (the r11 stride 7 divides 63 -> period 9, so
                    # k and k+9 aliased); with 5 the rolls are
                    # pairwise distinct for all k = 1..63, matching
                    # the --k <= 64 guard at parse time.
                    r = 1 + (k * 5) % 63
                    sel.append(
                        f"(embedding[{r + 1}:] || embedding[1:{r}])"
                        f" AS embedding"
                    )
                else:
                    sel.append(c)
            arms.append(
                "SELECT "
                + ", ".join(sel)
                + f" FROM '{args.src}/{t}.parquet'"
            )
        q = " UNION ALL ".join(arms)
        con.execute(
            f"COPY ({q}) TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{args.dst}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({args.k} replicas)")


if __name__ == "__main__":
    main()
