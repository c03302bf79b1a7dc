"""A PySpark-native analytics engine with the query and data-processing
capabilities of Azure/Embarrassingly-Parallel-Image-Classification,
plus LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis), designed for 100 TB scale.

Architecture: declarative DataFrame/SQL plans optimized by Catalyst;
Arrow-vectorized pandas UDFs only where built-in operators can't express
the semantics (batch DNN inference, custom stateful streaming).

Blueprint: SURVEY.md. Correctness contract: __spark_entry__.py
(DuckDB-oracle differential testing at sf0.01).
"""

from .registry import oracles, queries, register, specs  # noqa: F401

__version__ = "0.1.0"
