"""Cross-cutting utilities: seeding, logging, param counting."""
from .misc import count_parameters, fix_seeds, get_logger, makedirs

__all__ = ["count_parameters", "fix_seeds", "get_logger", "makedirs"]
