from .ar import CPCAR, BiDIRAR, BiDIRARTangled, NoAr
from .cpc import CPCModel, ConcatenatedModel, build_model, get_ar, init_model
from .encoder import (CPCEncoder, LFBEncoder, MFCCEncoder, DOWNSAMPLING,
                      get_encoder)
from .norms import ChannelNorm, Identity, InstanceNorm
from .transformer import TransformerAR, TransformerLayer

__all__ = [
    "CPCAR", "BiDIRAR", "BiDIRARTangled", "NoAr",
    "CPCModel", "ConcatenatedModel", "build_model", "get_ar", "init_model",
    "CPCEncoder", "LFBEncoder", "MFCCEncoder", "DOWNSAMPLING", "get_encoder",
    "ChannelNorm", "Identity", "InstanceNorm",
    "TransformerAR", "TransformerLayer",
]
