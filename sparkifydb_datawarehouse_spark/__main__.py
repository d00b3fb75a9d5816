"""CLI entry points — the analog of the reference's executable surface:
`create_tables.py` (drop-then-create, /root/reference/create_tables.py:47-68),
`etl.py` (staging loads + inserts, /root/reference/etl.py:53-76), and the
`make etl` composition `create` then `process` (/root/reference/Makefile:21-27).

    python -m sparkifydb_datawarehouse_spark create [--warehouse DIR]
    python -m sparkifydb_datawarehouse_spark process [--warehouse DIR]
    python -m sparkifydb_datawarehouse_spark etl [--warehouse DIR]

Per-statement durability is preserved (each table write is an
independent action, like the reference's per-statement commit), but
failures RAISE after logging instead of being swallowed — the SURVEY §3
improvement note (the reference logs and continues, leaving a
half-built warehouse that looks finished).
"""

from __future__ import annotations

import argparse
import logging
import shutil
import sys
from pathlib import Path

log = logging.getLogger("sparkifydb")

DEFAULT_WAREHOUSE = "warehouse"
STAR_TABLES = ("songplays", "users", "songs", "artists", "time")


def create(warehouse_dir: str) -> None:
    """Drop-then-create: clear the star-schema table directories
    (DROP TABLE IF EXISTS x7 analog — idempotent on absent tables)."""
    for name in STAR_TABLES:
        path = Path(warehouse_dir) / name
        if path.exists():
            log.info("dropping %s", path)
            shutil.rmtree(path)
    Path(warehouse_dir).mkdir(parents=True, exist_ok=True)
    log.info("warehouse ready at %s", warehouse_dir)


def process(warehouse_dir: str) -> dict[str, int]:
    """Staging loads + the five insert transforms + parquet writes."""
    from .pipelines.sparkify import run_pipeline
    from .session import get_spark

    spark = get_spark("sparkifydb-etl")
    counts = run_pipeline(spark, warehouse_dir)
    for name, n in counts.items():
        log.info("table %s: %d rows", name, n)
    return counts


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    parser = argparse.ArgumentParser(prog="sparkifydb_datawarehouse_spark")
    parser.add_argument("command", choices=["create", "process", "etl"])
    parser.add_argument("--warehouse", default=DEFAULT_WAREHOUSE)
    args = parser.parse_args(argv)

    if args.command in ("create", "etl"):
        create(args.warehouse)
    if args.command in ("process", "etl"):
        process(args.warehouse)
    return 0


if __name__ == "__main__":
    sys.exit(main())
