from . import transducer

__all__ = ["transducer"]
