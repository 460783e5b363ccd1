"""Training-data pipeline operators beyond the reference's own surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), approximate
similarity search over embeddings, text quality & language heuristics, and
multimodal binary-column plumbing. All designed 100-TB-first: one shuffle
per logical stage, native expressions wherever possible, pandas UDFs only
for genuinely vectorized math (numpy matmul), never per-row Python.
"""
