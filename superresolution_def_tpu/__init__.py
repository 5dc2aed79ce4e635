"""superresolution_def_tpu — TPU-native astronomical super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
GDev96/SuperResolution_Def (HST-vs-ground-observatory GAN super-resolution):

- ``ops``      — numerics parity kit (windows, pixel-shuffle, metrics, resize)
- ``kernels``  — Pallas TPU kernels for the attention hot paths
- ``models``   — Flax model zoo (SwinIR, HAT, HybridHATRealESRGAN,
                 UNet discriminators, SRVGGNetCompact, VGG feature net)
- ``data``     — manifests, 16-bit TIFF IO, on-device augmentation
- ``train``    — GAN training engine (losses, EMA, jitted train steps)
- ``parallel`` — device-mesh data parallelism over ICI (shard_map/pjit)
- ``ckpt``     — checkpointing with reference-compatible schemas
- ``obs``      — CSV/TensorBoard loggers, preview renderers
- ``prep``     — FITS/WCS dataset preparation pipeline
- ``cli``      — command-line entry points

Everything model-shaped runs NHWC (TPU-native conv layout), bfloat16-capable,
static-shaped, and jit-compilable end to end.
"""

__version__ = "0.1.0"
