"""Native (C++) host-runtime components.

`lib()` lazily builds and loads the rasterizer hot-loop library with
ctypes; callers fall back to the numpy tier when no toolchain exists.
Disable with TSNET_NATIVE=0.
"""

from .build import available, lib, native_draw_edge

__all__ = ["available", "lib", "native_draw_edge"]
