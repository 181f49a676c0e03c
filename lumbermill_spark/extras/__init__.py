"""Training-data pipeline operators beyond the reference's inventory:
deduplication, similarity search, text analysis, multimodal plumbing.

These are first-class engine components for the 100 TB use case (curating
web-scale corpora): every operator is expressed over DataFrames with explicit
blocking/bucketing so no step is O(n²) on the full corpus, and Python appears
only inside Arrow-batched pandas UDFs.
"""
