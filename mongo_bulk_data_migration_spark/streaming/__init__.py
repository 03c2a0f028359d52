from .replay import ChangeStreamReplayer

__all__ = ["ChangeStreamReplayer"]
