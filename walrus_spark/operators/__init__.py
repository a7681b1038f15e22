"""LLM-data-pipeline operators (north star, BASELINE.json).

dedup       — exact, n-gram Jaccard, MinHash+LSH, SimHash,
              embedding-cosine, connected-component clustering
similarity  — brute-force cosine top-k, IVF approximate variant
sketch      — engine-independent mergeable HyperLogLog (verifiable
              registers; per-bucket-max merge)
text        — token stats, quality scoring, language-ID, fingerprinting,
              PII scrubbing (email/IPv4/phone redaction)
multimodal  — opaque-binary columns + Arrow-batched decode/resize/
              feature extraction/frame sampling
pipeline    — sequence packing (distributed prefix sum), deterministic
              train/val splitting, seeded global shuffle + shard-file
              writing (write_shard_files), overlapping token chunking

Every operator is a pure DataFrame→DataFrame transform: no driver-side
loops over data, no unbounded collect() (the bounded exceptions are
metadata by construction: the 1-row query-vector lookup, the
n_centroids quantizer fit, seq_packing's per-bucket sums, and the
count()-gated convergence checks of the connected-components loop),
so each one scales with the cluster by construction.
"""
