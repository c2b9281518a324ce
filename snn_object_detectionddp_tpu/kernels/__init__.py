from .lif_pallas import lif_scan_pallas  # noqa: F401
