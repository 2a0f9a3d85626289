"""Relational + LLM-pipeline operators.

- ``silver``     — cleaning/derivation/dedup transform (reference silver layer)
- ``gold``       — the 7 gold marts as DataFrame-in/DataFrame-out functions
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram-Jaccard dedup
- ``similarity`` — cosine top-k search, LSH-bucketed ANN
- ``quality``    — dbt-style data-test assertions (unique/not_null/...)
- ``experiments``— A/B conversion lift, session transition flows, funnel timing
"""
