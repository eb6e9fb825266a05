from . import (dc_blocker, fast_tanh, oversample, partitioned_conv,  # noqa: F401
               scan_iir, softclip, svf)
