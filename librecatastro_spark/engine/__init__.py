from .exact import ExactBM25

__all__ = ["ExactBM25"]
