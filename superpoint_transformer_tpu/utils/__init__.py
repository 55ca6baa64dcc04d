from .histogram import atomic_to_histogram
