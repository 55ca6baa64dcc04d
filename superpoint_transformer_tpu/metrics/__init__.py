from .semantic import (
    ConfusionMatrix, confusion_matrix_from_histogram,
    confusion_matrix_update, iou_from_confmat, oa_from_confmat,
    macc_from_confmat, miou_from_confmat)
