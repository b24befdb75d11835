from . import money, refs, text, vectors
from .money import cents, cents_of
from .timestamps import GH_TS_FORMAT, format_gh_ts, parse_gh_ts

__all__ = [
    "money",
    "refs",
    "text",
    "vectors",
    "cents",
    "cents_of",
    "GH_TS_FORMAT",
    "parse_gh_ts",
    "format_gh_ts",
]
