from .spt import SPT
from .semantic import SemanticSegmentationModel, SemanticTask
from .panoptic import PanopticSegmentationModel, PanopticTask
from .partition import PartitionModel, PartitionTask, partition_purity
