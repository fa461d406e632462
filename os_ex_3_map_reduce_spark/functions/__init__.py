from .codecs import (  # noqa: F401
    decode_bmp,
    decode_wav_pcm16,
    encode_bmp,
    encode_wav_pcm16,
)
from .text import shingles, tokens  # noqa: F401
