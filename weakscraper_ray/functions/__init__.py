"""Scalar/UDF families for large-scale training-data pipelines:
text analysis, deduplication, similarity search, multimodal stubs."""
