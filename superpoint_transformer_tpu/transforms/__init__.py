from . import runtime
from .runtime import *
from .prepare import BatchConfig, prepare_batch, discover_caps
from . import preprocess
from .preprocess import preprocess_cloud
from . import color
from .color import (
    rgb_to_hsv, rgb_to_lab, add_color_features, color_auto_contrast,
    color_drop, color_normalize, center_position, room_position)
