from . import allpass, analyzer, cmaes, phase, resample  # noqa: F401
