from .dedup import OP_PRIORITY, dedup_batch, op_priority_col
from .mapper import map_destination
from .merge import merge_into
from .project import conform_to_schema
from .router import destinations, filter_heartbeats

__all__ = [
    "OP_PRIORITY",
    "dedup_batch",
    "op_priority_col",
    "map_destination",
    "merge_into",
    "conform_to_schema",
    "destinations",
    "filter_heartbeats",
]
