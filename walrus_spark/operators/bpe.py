"""Distributed BPE merge learning — the tokenizer-training precursor.

Classic byte-pair-encoding merge learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — a
public textbook algorithm): start from characters (+ an end-of-word
marker), repeatedly merge the most frequent adjacent symbol pair.
The reference system stores opaque bytes and has no tokenizer surface;
this is north-star LLM-pipeline scope (SURVEY.md §2.5) — the operator
that turns a 100 TB corpus into a subword vocabulary.

Key scale insight (same as the original algorithm): merges depend on
the corpus only through the WORD-FREQUENCY TABLE. One corpus-sized
aggregate builds (word, count) — vocabulary-sized, orders of magnitude
smaller than the corpus — and every Lloyd-style learning round then
runs over that table: explode each word's current symbol sequence into
adjacent pairs weighted by the word count, one keyed aggregate, one
deterministic argmax (max count, ties to the lexicographically first
pair — both engines/pythons agree), apply the merge to the symbol
sequences in an Arrow pass, repeat. Per round: O(vocab) rows shuffle,
never the corpus. The learned merge list is bounded driver metadata
(the k-means-centroid contract).

Everything is integer counts + string pairs — no floats — so the
python oracle (tests) reproduces the merge list EXACTLY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from walrus_spark.operators.text import tokens

# End-of-word marker. Must be (a) impossible as a single-character
# symbol (it is multi-char) and (b) printable/collision-safe: control
# bytes like \x01 DO occur in uncleaned web corpora, and tokens()
# only splits on whitespace, so a control-byte sentinel can appear
# word-interior and break the end-of-word invariant (merges leak
# across word boundaries, lossless reconstruction invents spaces).
# "</w>" is the standard choice (Sennrich et al.); symbols are
# compared whole — never substring-matched — so even a corpus word
# containing the literal text "</w>" still encodes/decodes exactly.
EOW = "</w>"


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt): the corpus collapsed to its vocabulary — the ONE
    corpus-sized aggregate BPE learning needs."""
    return (
        docs.select(
            F.explode(
                F.filter(tokens(F.col(text_col)), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the current symbol sequences,
    weighted by word count: explode pairs, one keyed aggregate."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("a"),
                F.element_at("syms", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array())
    return (
        vocab_syms.select("cnt", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("n"))
    )


def _apply_merge(vocab_syms: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) with the merged symbol a+b in one
    Arrow pass over the vocabulary table (left-to-right, non-
    overlapping — the classic semantics: 'aaa' with merge (a,a) →
    ['aa', 'a'])."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            out = [_merge_word(list(syms), a, b) for syms in pdf["syms"]]
            yield pd.DataFrame(
                {"word": pdf["word"], "cnt": pdf["cnt"], "syms": out}
            )

    return vocab_syms.mapInPandas(fn, vocab_syms.schema)


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) —
    the classic semantics: 'aaa' with merge (a,a) → ['aa', 'a'].

    THE single definition of the merge step: the distributed applier
    (_apply_merge), the local learner (_learn_merges_local), and the
    encoder (apply_bpe) all call this, so the exact-parity contract
    between them cannot silently diverge."""
    res: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            res.append(a + b)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return res


def _learn_merges_local(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """The merge loop over a driver-resident word-frequency table:
    incremental pair counting (a pair→words index so each merge touches
    only the words containing it) + a lazy-deletion max-heap for the
    argmax — the standard fast BPE trainer. Tie-break matches the
    distributed path exactly: (count desc, a asc, b asc), via heap
    entries (-n, a, b)."""
    import heapq
    from collections import defaultdict

    words = [list(w) + [EOW] for w, _ in word_counts]
    cnts = [c for _, c in word_counts]
    pair_n: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, syms in enumerate(words):
        c = cnts[idx]
        for p in zip(syms, syms[1:]):
            pair_n[p] += c
            pair_words[p].add(idx)
    heap = [(-n, a, b) for (a, b), n in pair_n.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        nn, a, b = heapq.heappop(heap)
        n = -nn
        if n <= 0 or pair_n.get((a, b), 0) != n:
            continue  # stale entry (count changed since push)
        merges.append((a, b, n))
        touched: set[tuple[str, str]] = set()
        for idx in pair_words.pop((a, b), ()):
            old = words[idx]
            c = cnts[idx]
            for p in zip(old, old[1:]):
                pair_n[p] -= c
                touched.add(p)
            new = _merge_word(old, a, b)
            words[idx] = new
            for p in zip(new, new[1:]):
                pair_n[p] += c
                pair_words[p].add(idx)
                touched.add(p)
        pair_n.pop((a, b), None)
        touched.discard((a, b))
        for p in touched:
            heapq.heappush(heap, (-pair_n[p], p[0], p[1]))
    return merges


# Above this many distinct words the trainer stays fully distributed;
# below it the word-frequency table collapses to the driver and the
# merge loop runs locally. 2M (word, cnt) rows is tens of MB — bounded
# driver metadata on the k-means-centroid model.
DRIVER_VOCAB_LIMIT = 2_000_000


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    vocab: DataFrame | None = None,
    driver_vocab_limit: int | None = DRIVER_VOCAB_LIMIT,
) -> list[tuple[str, str, int]]:
    """Learn the first ``n_merges`` BPE merges from the corpus (or a
    pre-built ``vocab`` (word, cnt) table). Returns
    [(left_symbol, right_symbol, pair_count), ...] in merge order.

    Deterministic: each round's winner is the pair with the highest
    corpus-weighted count, ties broken by (a, b) lexicographic order.
    Stops early when no adjacent pair remains.

    Job-count shape: merges depend on the corpus only through the
    word-frequency table, so when that table fits on the driver
    (≤ ``driver_vocab_limit`` distinct words) the loop runs locally
    over it: **O(1) Spark jobs regardless of n_merges** — ONE
    limit-bounded collect serves as both the size probe and the data
    (≤ limit+1 rows ever reach the driver; a separate count probe
    would re-run the whole corpus aggregate, Spark shares nothing
    between actions). A realistic tokenizer learns 32k merges; the
    distributed loop's ~2 jobs/merge would pay ~64k sequential job
    schedulings — the scheduling floor, not the data, becomes the
    cost. Above the limit the loop stays distributed (per round: one
    vocab-sized keyed aggregate + a 1-row argmax collect; O(vocab)
    rows shuffle, never the corpus). Pass ``driver_vocab_limit=None``
    (or 0) to force the distributed path."""
    if vocab is None:
        vocab = word_frequency_table(docs, text_col)
    if driver_vocab_limit:
        rows = vocab.limit(driver_vocab_limit + 1).collect()
        if len(rows) <= driver_vocab_limit:
            return _learn_merges_local(
                [(r["word"], int(r["cnt"])) for r in rows], n_merges
            )
        # vocabulary exceeds the driver budget — fall through to the
        # distributed loop (the collected prefix is discarded; its
        # cost is one bounded job, the same as the old probe)
    syms = vocab.select(
        "word",
        "cnt",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    ).cache()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(syms)
                .orderBy(F.col("n").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
            merges.append((a, b, n))
            nxt = _apply_merge(syms, a, b).cache()
            nxt.count()  # materialize before dropping the parent
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize ``docs`` with a learned merge list: per doc, each word
    becomes its BPE symbol sequence (merges applied in learned order —
    the standard encoder). Returns (doc_id, n_words, n_subwords,
    subwords array<string>). One Arrow pass in the scan stage — the
    merge list is a closure constant (driver metadata), so encoding is
    embarrassingly parallel and shuffle-free."""
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    order = [(a, b) for a, b, _ in merges]

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [EOW]
        for a, b in order:
            syms = _merge_word(syms, a, b)
        return syms

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(tokens(F.col(text_col)), lambda x: x != "").alias("ws"),
    )

    def fn(batches):
        # per-task memo: encode_word is pure and word frequency is
        # Zipfian, so caching per DISTINCT word converts the encode
        # pass from O(tokens · merges) to O(vocab · merges + tokens) —
        # the same word-frequency insight the learner exploits
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nw, ns, subs = [], [], [], []
            for did, ws in zip(pdf["doc_id"], pdf["ws"]):
                pieces: list[str] = []
                for w in ws:
                    enc = cache.get(w)
                    if enc is None:
                        enc = cache[w] = encode_word(w)
                    pieces.extend(enc)
                ids.append(did)
                nw.append(len(ws))
                ns.append(len(pieces))
                subs.append(pieces)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_words": nw,
                    "n_subwords": ns,
                    "subwords": subs,
                }
            )

    schema = StructType(
        [
            StructField("doc_id", base.schema["doc_id"].dataType),
            StructField("n_words", LongType()),
            StructField("n_subwords", LongType()),
            StructField("subwords", ArrayType(StringType())),
        ]
    )
    return base.mapInPandas(fn, schema)
