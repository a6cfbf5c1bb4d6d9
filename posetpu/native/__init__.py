"""Native host runtime: C++ parallel JPEG decode pool (ctypes-bound).

Replaces the reference's Python DataLoader fork workers (SURVEY.md §2 C15)
for the one host-side job that remains in posetpu — JPEG decode + pad.  The
shared library builds lazily on first use (g++ -O3, links system libjpeg)
and is cached next to the source; any failure (no compiler, non-JPEG file)
falls back transparently to the PIL path in posetpu.data.loader.
"""

from posetpu.native.bindings import NativeDecoder, native_available

__all__ = ["NativeDecoder", "native_available"]
