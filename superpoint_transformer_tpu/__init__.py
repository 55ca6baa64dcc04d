"""superpoint_transformer_tpu — TPU-native (JAX/XLA/Pallas) framework
with the capabilities of Superpoint Transformer (SPT / SuperCluster /
EZ-SP). See ARCHITECTURE.md.
"""
__version__ = '0.2.0'

from .utils.memory import tune_host_allocator as _tune_host_allocator
_tune_host_allocator()  # opt out with SPT_NO_MALLOC_TUNING=1

from .debug import set_debug, is_debug_enabled
