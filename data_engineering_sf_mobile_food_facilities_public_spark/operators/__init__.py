"""Composable relational operators (SURVEY.md section 2).

Each helper is a thin, lazily-planned DataFrame transformation — Catalyst
still sees through it (column pruning / predicate pushdown apply across
the helper boundary), so these are semantic conveniences, not a planner.
"""

from .constraints import check_fk_orphans, check_unique_violations
from .dedup import dedup_first, distinct_pairs
from .joins import join_small_dim
from .replicate import replicate_rows
from .topk import top_k
from .windows import grouped_running_max, grouped_running_sum, surrogate_key, window_count

__all__ = [
    "check_fk_orphans",
    "check_unique_violations",
    "dedup_first",
    "distinct_pairs",
    "grouped_running_max",
    "grouped_running_sum",
    "join_small_dim",
    "replicate_rows",
    "surrogate_key",
    "top_k",
    "window_count",
]
