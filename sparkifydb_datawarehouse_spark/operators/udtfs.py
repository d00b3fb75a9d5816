"""Python UDTF surface (Spark 4 `@udtf`) — user-defined TABLE
functions: one input row fans out to N output rows with their own
schema, usable in SQL FROM/LATERAL position.

Scale posture: a UDTF is row-at-a-time Python — the SLOW path, like
row UDFs (B17). The engine's rule stands: fan-out that built-ins can
express (split + explode/posexplode) stays JVM-side; a UDTF earns its
place only when per-row logic is genuinely imperative (stateful
per-row parsing, external-library tokenizers). This module registers
one anyway because the *API surface* is part of the engine contract —
and checks it value-for-value against the explode equivalent, which
is also exactly what DuckDB's unnest computes.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..registry import query
from ..tables import load_table

_VIEW_SEQ = itertools.count()  # unique view name per call (see below)


@udtf(returnType="sent_idx int, sentence string, n_chars int")
class SplitSentences:
    """Sentence-ish splitter: literal '. ' boundaries, python
    semantics (keeps empty segments) — chosen to be bit-reproducible
    by DuckDB string_split + generate_subscripts."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            yield i, s, len(s)


_ORACLE_UDTF = """
SELECT doc_id, sent_idx, sentence, n_chars
FROM (
    SELECT doc_id,
           generate_subscripts(parts, 1) - 1 AS sent_idx,
           unnest(parts) AS sentence
    FROM (
        SELECT doc_id, string_split(text, '. ') AS parts
        FROM documents
        WHERE doc_id % 20 = 0
    )
)
CROSS JOIN LATERAL (SELECT length(sentence) AS n_chars)
ORDER BY doc_id, sent_idx
"""


@query("q_udtf_split_sentences", oracle=_ORACLE_UDTF)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("split_sentences", SplitSentences)
    # LATERAL table-function position requires SQL FROM, hence a temp
    # view — but a SHARED view name could be redirected by a second
    # call before this lazy plan is collected, so each call registers
    # a unique one
    view = f"udtf_docs_{next(_VIEW_SEQ)}"
    # range-first (optimization r13, guide §2.4): with the ORDER BY
    # inside the SQL, the range partitioner's bound sampling called
    # the per-row UDTF a second time over every doc; ranging the view
    # frame by the sort key first and sorting within partitions keeps
    # the declared order with exactly one UDTF evaluation per row
    load_table(spark, sf_dir, "documents").filter(
        "doc_id % 20 = 0"
    ).repartitionByRange(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM {view} d, LATERAL split_sentences(d.text) s
        """
    ).sortWithinPartitions("doc_id", "sent_idx")
