from .lif import LIFParams, lif_scan, lif_step, run_lif, set_lif_impl, spike  # noqa: F401
