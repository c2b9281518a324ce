from .lif import LIFParams, lif_scan, lif_step, spike  # noqa: F401
