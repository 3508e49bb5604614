"""Native runtime bindings (C++ IO codec + threaded loader).

Build with ``make -C native`` from the repo root; Python falls back to
PIL/NumPy codecs transparently when the shared library is absent.
"""
