"""pinterest_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference pipeline (``d4min/pinterest-data-pipeline``,
see SURVEY.md): ingestion sources, cleaning transforms, the five canonical
analytics queries, a generic relational operator surface, a streaming slice,
and large-scale training-data extensions (dedup, similarity search,
multimodal columns, text analysis).

Everything is expressed through the public DataFrame / SQL API so Catalyst
and Tungsten handle optimization and physical execution; no RDD-level or
custom-planner code. Designed for a 1000-executor cluster over ~100 TB:
declared schemas (no inference), broadcast-eligible dimension joins,
partial aggregation, AQE, and compacted outputs.
"""

__version__ = "0.1.0"
