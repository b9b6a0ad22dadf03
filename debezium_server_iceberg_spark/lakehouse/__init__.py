from .catalog import LakeCatalog
from .table import DataFile, DeleteFile, LakeTable, TableMetadata
from .transforms import parse_partition_spec, PartitionField

__all__ = [
    "LakeCatalog",
    "LakeTable",
    "DataFile",
    "DeleteFile",
    "TableMetadata",
    "parse_partition_spec",
    "PartitionField",
]
