"""Physical-plan introspection utilities.

There is no custom IR or Catalyst rule in this engine (SURVEY.md §4.2 —
every operator compiles to stock Spark operators); this package instead
gives the *tests* a way to pin the physical properties that matter at
100 TB: filters reaching the scan, dimensions broadcast, facts never
broadcast, shuffle counts bounded.
"""

from data_integration_system_spark.plans.analyze import (
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    scan_read_schemas,
    shuffle_count,
    sortmerge_join_count,
)

__all__ = [
    "broadcast_join_count",
    "formatted_plan",
    "pushed_filters",
    "scan_read_schemas",
    "shuffle_count",
    "sortmerge_join_count",
]
