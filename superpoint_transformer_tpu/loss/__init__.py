from .semantic import ce_loss, ce_with_histogram, multi_stage_loss
from .focal import weighted_focal_loss, binary_focal_loss
from .weighted import (
    weighted_l1_loss, weighted_l2_loss, weighted_bce_with_logits_loss)
from .lovasz import lovasz_softmax_loss
from .partition_criterion import (
    partition_criterion, edge_affinity_from_features)
