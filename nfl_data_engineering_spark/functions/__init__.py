"""Column-function surface: text analysis, hashing/sketches, similarity.

These are the LLM-data-pipeline extensions (BASELINE.json north star) built
on the scalar-function layer the reference exercises (SURVEY.md §2.7). All
deterministic and engine-portable: hash primitives are md5-based so the
DuckDB oracle can reproduce every sketch bit-for-bit.
"""
