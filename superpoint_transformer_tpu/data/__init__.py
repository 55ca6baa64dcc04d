from .data import Data
from .nag import NAG
from .csr import CSRData, Cluster, InstanceData
from .pad import PaddedLevel, PaddedNAG, batch_nags, sort_nag_by_super, \
    pad_nag, bucket
