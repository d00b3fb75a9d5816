"""sparkifydb_datawarehouse_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference repo
drpdr/sparkifydb-datawarehouse (a Redshift star-schema ELT pipeline;
see SURVEY.md) as an idiomatic Spark DataFrame / Spark SQL engine,
extended with the general analytics surface and LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis) that a 100 TB training-data pipeline needs.

Layout:
    session.py    SparkSession builder (AQE on, scale-tuned defaults)
    tables.py     fixture-table catalog (parquet loaders + temp views)
    registry.py   query/oracle registries backing __spark_entry__
    operators/    relational operators (joins, aggs, windows, ...)
    functions/    scalar/expression shims (dateparts, text, vectors)
    sources/      source connectors (mapped JSON, parquet, csv)
    pipelines/    the Sparkify ETL replica (staging -> star schema)
    llm/          dedup, similarity search, text analysis, multimodal
    streaming/    Structured Streaming windows, watermarks, dedup
"""

__version__ = "0.1.0"
