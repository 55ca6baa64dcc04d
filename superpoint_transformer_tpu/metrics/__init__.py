from .semantic import (
    ConfusionMatrix, confusion_matrix_from_histogram,
    confusion_matrix_update, iou_from_confmat, oa_from_confmat,
    macc_from_confmat, miou_from_confmat)
from .panoptic import PanopticQuality3D, panoptic_quality_from_overlaps
from .mean_average_precision import (
    MeanAveragePrecision3D, average_precision)
from .oracle import (
    semantic_segmentation_oracle, panoptic_segmentation_oracle,
    instance_segmentation_oracle)
from .weighted_li import WeightedL1Error, WeightedL2Error
