from . import runtime
from .runtime import *
from .prepare import BatchConfig, prepare_batch
