"""Cross-cutting utilities: seeding, logging, param counting."""
from .misc import atomic_write, count_parameters, fix_seeds, get_logger, makedirs

__all__ = ["atomic_write", "count_parameters", "fix_seeds", "get_logger", "makedirs"]
