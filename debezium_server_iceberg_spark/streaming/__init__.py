from .consumer import ChangeConsumer

__all__ = ["ChangeConsumer"]
