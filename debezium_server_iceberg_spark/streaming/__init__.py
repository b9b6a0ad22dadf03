from .consumer import ChangeConsumer
from .progress import ConsumerProgressListener
from .rollup import ContinuousRollup
from .windows import running_user_totals, session_windows, sliding_counts, tumbling_counts

__all__ = [
    "ChangeConsumer",
    "ConsumerProgressListener",
    "ContinuousRollup",
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "running_user_totals",
]
