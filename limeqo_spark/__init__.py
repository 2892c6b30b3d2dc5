"""limeqo_spark — a PySpark-native analytics engine with the capabilities of
zixy17/LimeQO (offline query-optimizer steering via low-rank matrix
completion) plus the relational / streaming / LLM-data-pipeline surface that
domain presupposes.

Layers (see SURVEY.md §2):
  - ``relational``  : the Spark SQL operator surface (Q01..Q44 manifest)
  - ``workload``    : long-form workload-matrix (query, hint, latency) tables
  - ``complete``    : ALS + censored-ALS matrix completion
  - ``strategies``  : Oracle / Random / Greedy / QOAdvisor / LimeQO / LimeQO+
  - ``hints``       : HintSet registry (Spark conf + join-hint steering)
  - ``plans``       : plan capture, canonical fingerprint, featurization
  - ``pipeline``    : dedup / similarity / text / multimodal operators
  - ``streaming``   : Structured Streaming windows, sessions, dedup
"""

__version__ = "0.1.0"
