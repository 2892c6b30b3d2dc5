"""Large-scale training-data pipeline operators (BASELINE.json north star):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality, token counting, fingerprinting), and multimodal
column plumbing. Importing registers their queries() entries."""

from limeqo_spark.pipeline import cdc, cluster, curation, dedup, er, mix, multimodal, similarity, sketches, text, vocab  # noqa: F401
