"""Codec layer: bitstream parsers (native C++ + Python fallback) and gated
container/codec glue."""

from . import bitstream

__all__ = ["bitstream"]
