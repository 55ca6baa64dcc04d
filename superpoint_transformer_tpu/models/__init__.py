from .spt import SPT
