"""modern_search_engines_spark — a PySpark-native inverted-index + BM25
search engine with the query/data-processing capabilities of
XeniaRieger/Modern-Search-Engines, rebuilt Spark-first from scratch.

Layout
------
textlib.py      shared tokenizer/lemmatizer/simhash/lang-ID spec-as-code
htmlx.py        stdlib HTML extraction with the reference's bs4 semantics
corpus.py       deterministic synthetic Common-Crawl-style page generator
oracle/         single-node oracle engine (parity target)
functions/      pandas/Arrow UDFs + posting-list codec + text analysis
operators/      index build, query engine, WAND, dedup, similarity, rerank
sources/        table IO, run files, checkpoint/resume manifests
streaming/      incremental index maintenance (Structured Streaming)
"""

__version__ = "0.1.0"
