from . import runtime
from .runtime import *
from .prepare import BatchConfig, prepare_batch
from . import preprocess
from .preprocess import preprocess_cloud
