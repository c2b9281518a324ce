from .overlay import draw_bboxes, run_visualization  # noqa: F401
from .video import stitch_video  # noqa: F401
