from .explain import (
    assert_plan_contains,
    broadcast_join_count,
    formatted_plan,
    has_pushed_filters,
    shuffle_exchange_count,
)

__all__ = [
    "assert_plan_contains",
    "broadcast_join_count",
    "formatted_plan",
    "has_pushed_filters",
    "shuffle_exchange_count",
]
