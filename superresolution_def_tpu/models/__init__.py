from .swinir import SwinIR
from .hat import HAT
from .hybrid import HybridHATRealESRGAN
from .discriminators import UNetDiscriminatorSNSwin, UNetDiscriminatorSNHAT
from .srvgg import SRVGGNetCompact

__all__ = [
    "SwinIR",
    "HAT",
    "HybridHATRealESRGAN",
    "UNetDiscriminatorSNSwin",
    "UNetDiscriminatorSNHAT",
    "SRVGGNetCompact",
]
