"""Native (C++) components, loaded via ctypes.

Build once with `make -C cpp` (done automatically on first import if the
shared library is missing and a compiler is available).
"""
