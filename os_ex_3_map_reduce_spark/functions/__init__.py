from .text import shingles, tokens  # noqa: F401
