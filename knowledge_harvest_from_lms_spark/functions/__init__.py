from . import scoring, stopwords, textops

__all__ = ["textops", "scoring", "stopwords"]
