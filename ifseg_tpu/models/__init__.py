from .segofa import SegOFA, SegOFAVariables

__all__ = ["SegOFA", "SegOFAVariables"]
