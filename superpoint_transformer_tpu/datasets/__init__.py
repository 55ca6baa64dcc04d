from .base import BaseDataset, DataLoader, PreparedDataLoader
from .s3dis import S3DIS, MiniS3DIS, S3DIS_CLASS_NAMES
from .dales import DALES, MiniDALES, DALES_CLASS_NAMES
from .kitti360 import KITTI360, MiniKITTI360, KITTI360_CLASS_NAMES
from .scannet import ScanNet, MiniScanNet, SCANNET_CLASS_NAMES
from .s3dis_room import S3DISRoom, MiniS3DISRoom
from .base import make_submission
