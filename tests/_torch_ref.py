"""Helpers to load the read-only torch reference for numerics parity tests.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT — we import its
modules purely as a golden-numerics oracle, never copy code from it, and skip
tests gracefully when it (or torch) is unavailable.

HAT modules need `basicsr` + a torchvision shim; we provide minimal stubs so
the arch file imports (the stubs implement only the registry decorator and
two tensor utilities, both standard public API surface).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _install_basicsr_stub():
    if "basicsr" in sys.modules:
        return
    import torch

    basicsr = types.ModuleType("basicsr")
    utils = types.ModuleType("basicsr.utils")
    registry = types.ModuleType("basicsr.utils.registry")
    archs = types.ModuleType("basicsr.archs")
    arch_util = types.ModuleType("basicsr.archs.arch_util")

    class _Registry:
        def register(self, obj=None):
            if obj is None:
                return lambda o: o
            return obj

    registry.ARCH_REGISTRY = _Registry()

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return torch.nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    arch_util.to_2tuple = to_2tuple
    arch_util.trunc_normal_ = trunc_normal_

    basicsr.utils = utils
    basicsr.archs = archs
    utils.registry = registry
    archs.arch_util = arch_util
    sys.modules["basicsr"] = basicsr
    sys.modules["basicsr.utils"] = utils
    sys.modules["basicsr.utils.registry"] = registry
    sys.modules["basicsr.archs"] = archs
    sys.modules["basicsr.archs.arch_util"] = arch_util


def load_reference_swinir():
    """Import the reference SwinIR class (torch-only module)."""
    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        from models.architecture_swin import SwinIR  # type: ignore

        return SwinIR
    finally:
        sys.path.pop(0)


def load_reference_discriminator_swin():
    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        from models.discriminator_swin import UNetDiscriminatorSN  # type: ignore

        return UNetDiscriminatorSN
    finally:
        sys.path.pop(0)


def load_reference_discriminator_hat():
    _install_basicsr_stub()
    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        from models.discriminator_hat import UNetDiscriminatorSN  # type: ignore

        return UNetDiscriminatorSN
    finally:
        sys.path.pop(0)


def load_reference_hat():
    _install_basicsr_stub()
    sys.path.insert(0, str(REFERENCE_ROOT / "models" / "hat_arch"))
    try:
        import hat_arch as ref_hat  # type: ignore

        return ref_hat.HAT
    finally:
        sys.path.pop(0)


def load_reference_srvgg():
    _install_basicsr_stub()
    sys.path.insert(0, str(REFERENCE_ROOT / "models" / "hat_arch"))
    try:
        import srvgg_arch  # type: ignore

        return srvgg_arch.SRVGGNetCompact
    finally:
        sys.path.pop(0)


def _install_torchvision_stub():
    """hybridmodels_hat.py shims torchvision.transforms.functional_tensor by
    importing torchvision.transforms.functional — absent in this image, so
    stub the three module names with an empty placeholder."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    tv.transforms = transforms
    transforms.functional = functional
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def load_reference_hybrid():
    _install_basicsr_stub()
    _install_torchvision_stub()
    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        from models.hybridmodels_hat import HybridHATRealESRGAN  # type: ignore

        return HybridHATRealESRGAN
    finally:
        sys.path.pop(0)


def load_reference_metrics():
    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        from utils.metrics_swin import TrainMetrics, ssim_torch  # type: ignore

        return TrainMetrics, ssim_torch
    finally:
        sys.path.pop(0)
