"""pdf_ocr_engine_spark — a PySpark-native web-scale extraction engine.

Brand-new implementation (NOT a port) with the query/data-processing
capabilities of ajjucoder/pdf-ocr-engine, re-expressed Spark-first per
/root/repo/SURVEY.md: batch main-content extraction over Common-Crawl-style
page tables ``(url, warc_ts, html, text, lang)`` — byte-stream sniffing,
HTML boilerplate stripping, PDF word-box layout reconstruction — plus the
training-data-pipeline operators a 100 TB corpus needs (dedup, similarity
search, text analysis, multimodal plumbing).

Layout:
  core/       pure-Python byte-identity kernels (layout, html, codec, hyphen)
  operators/  Arrow-batched Spark operators (extract, dedup, ann, multimodal)
  sources/    deterministic fixture generation + table readers/writers
  functions/  JVM-side column-expression libraries (text analysis, sniffing)
  plans/      staged pipeline DAG, salting, metrics/lineage, checkpoint resume
  streaming/  incremental-processing notes/stubs (batch+manifest is the
              resumability model per SURVEY.md §1.4)
"""

__version__ = "0.1.0"
