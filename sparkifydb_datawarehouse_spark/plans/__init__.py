"""Plan inspection utilities — the engine's `.explain` toolkit.

Used by tests to assert physical-plan properties (the things that
matter at 100 TB): filters pushed into scans, columns pruned, the
intended join strategy chosen, whole-stage codegen applied.
"""

from .inspect import (  # noqa: F401
    executed_plan,
    join_strategies,
    pushed_filters,
    read_schemas,
)
