"""Typed-failure boundary for the pure-python media codecs.

At 100-TB crawl scale every byte string reaching a decoder is
untrusted; a corrupt payload must fail with a TYPED, catchable error
(ValueError — or NotImplementedError for a recognized-but-unsupported
codec), never leak implementation exceptions (struct.error on a short
read, IndexError on a truncated table, KeyError on a bad enum,
zlib.error on a broken stream) that a pipeline stage's error policy
would misclassify as a bug rather than bad data.

``typed_decode(fmt)`` wraps a decoder (plain function or generator —
generators are wrapped so mid-ITERATION corruption is also typed) and
re-raises those leak-prone exception types as ``ValueError``.
MemoryError and KeyboardInterrupt are deliberately NOT caught —
resource exhaustion is not data corruption. tests/test_codec_fuzz.py
drives every decoder with hypothesis-mutated payloads and asserts the
contract.
"""

from __future__ import annotations

import functools
import inspect
import struct
import zlib

# exception types a corrupt payload may leak from stdlib/numpy parsing
_LEAKS = (struct.error, IndexError, KeyError, OverflowError, EOFError,
          TypeError, zlib.error)

# Decompression-bomb cap shared by the image decoders: a corrupt
# header dimension (16-bit in JPEG/GIF, 32-bit in PNG) can demand a
# multi-GB allocation — and in JPEG a same-order Python MCU loop —
# from a 100-byte payload, long before any "truncated stream" check
# runs. 2^24 pixels = 4096×4096, above real web images; oversized
# frames fail TYPED instead of OOMing the worker.
MAX_DECODE_PIXELS = 1 << 24


def typed_decode(fmt: str):
    """Decorator: corruption-induced ``_LEAKS`` become ``ValueError``;
    ValueError / NotImplementedError pass through untouched."""
    def wrap(fn):
        if inspect.isgeneratorfunction(fn):
            @functools.wraps(fn)
            def gen(*args, **kwargs):
                try:
                    yield from fn(*args, **kwargs)
                except (ValueError, NotImplementedError):
                    raise
                except _LEAKS as e:
                    raise ValueError(
                        f"corrupt {fmt} payload: {type(e).__name__}: {e}"
                    ) from e
            return gen

        @functools.wraps(fn)
        def inner(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except _LEAKS as e:
                raise ValueError(
                    f"corrupt {fmt} payload: {type(e).__name__}: {e}"
                ) from e
        return inner
    return wrap
