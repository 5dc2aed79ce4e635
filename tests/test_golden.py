"""Golden-output locks: seeded tiny models vs recorded outputs.

Catches silent numerics regressions without needing the torch oracle
(SURVEY.md §4: 'parity tests ... vs fixed input -> fixed output').
Regenerate with: python tests/test_golden.py  (writes tests/golden/*.npz)
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"


def _cases():
    import jax
    import jax.numpy as jnp
    from superresolution_def_tpu.models import SwinIR, HAT, HybridHATRealESRGAN

    x16 = jnp.asarray(np.random.default_rng(123).random((1, 16, 16, 1), np.float32))

    def swin():
        m = SwinIR(img_size=16, in_chans=1, embed_dim=16, depths=(2,),
                   num_heads=(2,), window_size=8, mlp_ratio=2.0, upscale=4)
        p = m.init(jax.random.PRNGKey(7), x16)["params"]
        return m.apply({"params": p}, x16)

    def hat():
        m = HAT(img_size=16, in_chans=1, embed_dim=30, depths=(2,), num_heads=(6,),
                window_size=8, upscale=2, upsampler="pixelshuffle", img_range=1.0)
        p = m.init(jax.random.PRNGKey(7), x16)["params"]
        return m.apply({"params": p}, x16, True)

    def hybrid():
        m = HybridHATRealESRGAN(img_size=16, in_chans=1, embed_dim=16, depths=(1,),
                                num_heads=(2,), window_size=8, upscale=4,
                                num_rrdb=1, num_feat=16, num_grow_ch=8)
        p = m.init(jax.random.PRNGKey(7), x16)["params"]
        return m.apply({"params": p}, x16, True)

    return {"swinir": swin, "hat": hat, "hybrid": hybrid}


@pytest.mark.parametrize("name", ["swinir", "hat", "hybrid"])
def test_golden_outputs(name):
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden {path} missing — run tests/test_golden.py to record")
    got = np.asarray(_cases()[name]())
    want = np.load(path)["out"]
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


if __name__ == "__main__":
    import os, sys

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, str(Path(__file__).parent.parent))
    import jax

    jax.config.update("jax_platforms", "cpu")
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name, fn in _cases().items():
        np.savez(GOLDEN_DIR / f"{name}.npz", out=np.asarray(fn()))
        print("recorded", name)
