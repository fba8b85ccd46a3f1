from . import compiler, plans

__all__ = ["compiler", "plans"]
