from .lr_scheduler import cosine_with_warmup, make_optimizer
