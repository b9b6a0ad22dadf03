from .catalog import LakeCatalog
from .table import LakeTable, TableMetadata
from .transforms import parse_partition_spec, PartitionField

__all__ = [
    "LakeCatalog",
    "LakeTable",
    "TableMetadata",
    "parse_partition_spec",
    "PartitionField",
]
