from .mlp import MLP, FFN, Classifier, leaky_relu
from .norm import (GraphNorm, LayerNorm, InstanceNorm, GroupNorm,
                   BatchNorm, UnitSphereNorm, unit_sphere_norm,
                   INDEX_BASED_NORMS)
from .attention import SelfAttentionBlock, dense_graph_attention
from .transformer import TransformerBlock, DropPath
from .stage import Stage, DownNFuseStage, UpNFuseStage, PointStage, fuse
from .pool import pool, AttentivePool, AttentivePoolWithLearntQueries
from .sparse import SparseConvBlock, SparseCNN
from .position_encoding import (
    CatInjection, AdditiveInjection, MLPInjection, FourierInjection,
    LearnableFourierInjection, injection_factory)
