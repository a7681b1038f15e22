"""LLM-data-pipeline operators (north star, BASELINE.json).

dedup       — exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine
similarity  — brute-force cosine top-k, IVF approximate variant
text        — token stats, quality scoring, language-ID, fingerprinting
multimodal  — opaque-binary columns + Arrow-batched feature extraction

Every operator is a pure DataFrame→DataFrame transform: no driver-side
loops, no collect() in the data path (the single query-vector lookup in
similarity search is the one intentional 1-row exception), so each one
scales with the cluster by construction.
"""
