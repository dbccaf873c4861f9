"""LLM-training-data pipeline operators (north-star extensions).

Beyond the reference's own operator surface, these are the ops a 100 TB
training-data pipeline needs: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search over embeddings, text analysis
(language-ID, quality, tokens, fingerprints), and multimodal binary-column
plumbing. Everything is built from JVM column expressions (no Python UDFs)
except the multimodal decode stubs, which are Arrow-batched by design.
"""
