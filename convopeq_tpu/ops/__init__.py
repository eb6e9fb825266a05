from . import fast_tanh, scan_iir, svf  # noqa: F401
