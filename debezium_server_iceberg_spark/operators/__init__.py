from .dedup import OP_PRIORITY, dedup_batch, op_priority_col
from .mapper import map_destination
from .merge import merge_dataframes, merge_into
from .project import conform_to_schema
from .router import destinations, filter_heartbeats
from .skew import salted_agg, salted_join
from .temporal import asof_join, range_join

__all__ = [
    "OP_PRIORITY",
    "dedup_batch",
    "op_priority_col",
    "map_destination",
    "merge_into",
    "merge_dataframes",
    "conform_to_schema",
    "destinations",
    "filter_heartbeats",
    "salted_agg",
    "salted_join",
    "asof_join",
    "range_join",
]
