from . import decode, envelope, pair

__all__ = ["decode", "envelope", "pair"]
