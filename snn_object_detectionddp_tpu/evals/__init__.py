from .map import DetMetrics, ap_per_class, match_predictions  # noqa: F401
