"""Native (C) runtime pieces, bound via ctypes.

Builds lazily with the system compiler on first use; every entry point has a
pure-numpy fallback so the framework works without a toolchain.
"""

from dense2sparse_vit_tpu.native.normalize import (  # noqa: F401
    native_available,
    normalize_u8,
)
