"""Custom Python DataSource WRITER (Spark 4 `pyspark.sql.datasource`)
— the outbound half of the connector story (`pysource.py` is the
inbound half: batch reader with filter pushdown + stream reader).

The sink writes JSONL files, one per task, with the two-phase commit
protocol the API models after real connectors:

- `write(iterator)` runs ON EXECUTORS, streams its partition to a
  UNIQUELY-NAMED temp file, and returns a WriterCommitMessage naming
  it (plus row/byte counts).
- `commit(messages)` runs ON THE DRIVER only after every task
  succeeded, renames temp → final in one pass and drops a _SUCCESS
  manifest (rename-as-commit: a crashed job leaves only temp files,
  never a half-visible dataset).
- `abort(messages)` removes whatever temp files the failed attempt
  left behind.

That protocol — not the JSONL formatting — is the point: it is
exactly how a warehouse keeps object-store writes atomic-ish at
100 TB (task retries produce new temp names; only the driver's
single commit makes data visible).
"""

from __future__ import annotations

import json
import os
import uuid

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class JsonlCommit(WriterCommitMessage):
    tmp_name: str
    n_rows: int
    n_bytes: int


class JsonlDirWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires a 'path' option")

    def write(self, iterator) -> JsonlCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = f"_tmp_{uuid.uuid4().hex}.jsonl"
        n = b = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in iterator:
                line = json.dumps(row.asDict(), default=str)
                f.write(line + "\n")
                n += 1
                b += len(line) + 1
        return JsonlCommit(tmp_name=tmp, n_rows=n, n_bytes=b)

    def commit(self, messages) -> None:
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.rename(os.path.join(self.path, m.tmp_name), final)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"n_files": len(list(messages)), "n_rows": total}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except FileNotFoundError:
                    pass


class JsonlDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)
