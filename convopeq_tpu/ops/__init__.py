from . import (dc_blocker, fast_tanh, fft_backend, limiter,  # noqa: F401
               oversample, partitioned_conv, scan_iir, softclip, svf)
