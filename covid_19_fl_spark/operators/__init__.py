from .analytics import (
    cumulative_sum,
    daily_counts,
    daily_delta,
    growth_rates,
    growth_sim,
    last_row,
    per_capita_counts,
    tail_n,
    top_k_by_count,
)

__all__ = [
    "cumulative_sum",
    "daily_counts",
    "daily_delta",
    "growth_rates",
    "growth_sim",
    "last_row",
    "per_capita_counts",
    "tail_n",
    "top_k_by_count",
]
