"""English stopword list used by entity filters.

The reference builds this as ``nltk.corpus.stopwords.words('english')``
plus 20 extra words (reference ``data_utils/data_utils.py:1-13``).
nltk is not available in this sandbox, so the standard public NLTK
English stopword list (179 words, identical across nltk releases for
years) is embedded verbatim as data, followed by the reference's extra
words in the same order.
"""

from __future__ import annotations

# nltk.corpus.stopwords.words('english') — public list, embedded.
NLTK_ENGLISH_STOPWORDS: list[str] = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't",
]

# Extra words appended by the reference (data_utils/data_utils.py:5-13).
EXTRA_STOPWORDS: list[str] = [
    "everything", "everybody", "everyone",
    "anything", "anybody", "anyone",
    "something", "somebody", "someone",
    "nothing", "nobody",
    "one", "neither", "either", "many",
    "us", "first", "second", "next",
    "following", "last", "new", "main", "also",
]

STOPWORDS: list[str] = NLTK_ENGLISH_STOPWORDS + EXTRA_STOPWORDS
STOPWORD_SET: frozenset[str] = frozenset(STOPWORDS)
