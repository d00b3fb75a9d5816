"""LLM-data-pipeline operators: dedup, similarity search, text
analysis, multimodal columns (BASELINE.json north star; SURVEY §2
B16-B20). All hot paths are built-in expression-level Spark —
Pandas UDFs only where semantics demand Python (multimodal decode).
"""
