from . import pii, scoring, stopwords, textops, urls

__all__ = ["textops", "scoring", "stopwords", "urls", "pii"]
