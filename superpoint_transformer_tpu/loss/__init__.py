from .semantic import ce_loss, ce_with_histogram, multi_stage_loss
