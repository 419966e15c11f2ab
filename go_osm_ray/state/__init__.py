"""Run-state layer: per-partition lineage records and resumable writes
(north rule: "resumable from checkpoint with per-partition lineage +
metrics")."""

from .lineage import (  # noqa: F401
    LineageRecord,
    completed_partitions,
    read_manifest,
    write_partitioned,
)
