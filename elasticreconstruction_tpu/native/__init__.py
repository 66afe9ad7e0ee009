"""Native (C++) runtime components.

The reference's runtime around the math is C++ (file IO, data loading —
SURVEY.md §2); the same roles stay native here: a zlib-based 16-bit depth
PNG codec with a threaded batch loader (``loader``), consumed through
ctypes.  Python/PIL fallbacks keep everything working where the toolchain is
unavailable.
"""

from . import loader
from .loader import read_depth, read_depth_batch, write_depth

__all__ = ["loader", "read_depth", "read_depth_batch", "write_depth"]
