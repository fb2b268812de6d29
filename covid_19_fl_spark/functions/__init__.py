from .normalize import (
    digits_to_int,
    epoch_ms_to_day,
    guarded_ratio,
    na_to_default,
    na_to_null,
    parse_date,
    per_capita,
    split_title_array,
    title_case,
)

__all__ = [
    "digits_to_int",
    "epoch_ms_to_day",
    "guarded_ratio",
    "na_to_default",
    "na_to_null",
    "parse_date",
    "per_capita",
    "split_title_array",
    "title_case",
]
