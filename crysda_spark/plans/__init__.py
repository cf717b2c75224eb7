"""Plan inspection and scale tooling.

The reference has no optimizer (SURVEY §4) — Catalyst/AQE supply
pushdown, pruning, join selection, and skew splitting. This module adds
the operational layer a 100 TB deployment needs on top:

- scan_health: verify a plan actually pushes filters / prunes columns
  before it ships (catches the "reads every column for a 2-column
  projection" regression class in CI).
- salted_join / salted_agg: explicit hot-key mitigation for when AQE's
  runtime skew splitting isn't available (non-AQE paths, stream-static
  joins, deliberate partitioning).
- bucketed writes: co-located joins that skip the shuffle entirely for
  repeat join keys.
"""

from .cache import pin, pinned_count, release_pinned
from .inspect import scan_health, shuffle_count
from .skew import salted_agg, salted_join
from .bucketing import write_bucketed

__all__ = ["scan_health", "shuffle_count", "salted_join", "salted_agg",
           "write_bucketed", "pin", "release_pinned", "pinned_count"]
