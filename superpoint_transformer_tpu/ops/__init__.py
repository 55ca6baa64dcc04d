from .segment import *
from .graph import *
from .geometry import *
from .components import *
from . import device_preprocess
