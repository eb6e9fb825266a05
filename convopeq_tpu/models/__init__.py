from . import chain, convolver, eq, gain_planner, nuc, output_filter  # noqa: F401
