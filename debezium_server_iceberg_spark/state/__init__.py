from .offsets import OffsetStore
from .history import SchemaHistoryStore
from .archive import EventsArchive

__all__ = ["OffsetStore", "SchemaHistoryStore", "EventsArchive"]
