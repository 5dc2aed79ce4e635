"""SwinIR forward parity: flax NHWC model vs the torch reference oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from superresolution_def_tpu.models import SwinIR
from superresolution_def_tpu.models.torch_port import (
    swinir_from_torch,
    detect_swinir_params,
)
from tests._torch_ref import load_reference_swinir

RNG = np.random.default_rng(42)



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def make_pair(img_size=32, embed_dim=60, depths=(2, 2), heads=(6, 6), ws=8, upscale=4):
    RefSwinIR = load_reference_swinir()
    torch.manual_seed(0)
    ref = RefSwinIR(
        upscale=upscale,
        in_chans=1,
        img_size=img_size,
        window_size=ws,
        depths=list(depths),
        embed_dim=embed_dim,
        num_heads=list(heads),
        mlp_ratio=2,  # swallowed by **kwargs in the reference -> actual 4
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = SwinIR(
        img_size=img_size,
        in_chans=1,
        embed_dim=embed_dim,
        depths=depths,
        num_heads=heads,
        window_size=ws,
        upscale=upscale,
    )
    params = swinir_from_torch(sd, depths)
    return ref, model, {"params": params}


class TestSwinIRParity:
    def test_forward_matches_torch(self):
        ref, model, variables = make_pair()
        x = RNG.random((2, 32, 32, 1)).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
        ours = model.apply(variables, jnp.asarray(x))
        ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
        err = np.abs(ours_nchw - expected.numpy())
        # <=0.01 dB PSNR equivalence needs per-pixel agreement ~1e-4 here
        assert err.max() < 2e-4, f"max abs err {err.max()}"

    def test_forward_matches_torch_flagship_config(self):
        """Parity lock at the ACTUAL train config (train_swin.py:147-149:
        128->512, embed 180, depths (6,)*6, effective mlp_ratio 4) — 36
        stacked blocks could amplify per-block drift that the reduced
        configs hide (VERDICT r2 #4). Measured max-abs 2.1e-07 on this
        host; 5e-6 gives 20x headroom and still implies far below the
        0.01 dB PSNR gate. ~2 min on a 1-core CPU host."""
        ref, model, variables = make_pair(
            img_size=128, embed_dim=180, depths=(6,) * 6, heads=(6,) * 6
        )
        x = RNG.random((1, 128, 128, 1)).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
        ours = model.apply(variables, jnp.asarray(x))
        err = np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - expected.numpy())
        assert err.max() < 5e-6, f"max abs err {err.max()}"

    def test_param_tree_covers_all_torch_weights(self):
        ref, model, variables = make_pair()
        x = jnp.zeros((1, 32, 32, 1))
        init_vars = model.init(jax.random.PRNGKey(0), x)
        ported = variables["params"]

        def leaves(tree, prefix=""):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out.update(leaves(v, prefix + k + "/"))
                else:
                    out[prefix + k] = np.asarray(v).shape
            return out

        init_shapes = leaves(init_vars["params"])
        ported_shapes = leaves(ported)
        assert init_shapes == ported_shapes

    def test_nonsquare_input_pads_and_crops(self):
        ref, model, variables = make_pair()
        # 20x28 is not a multiple of 8 -> exercises reflect-pad + crop.
        # (The torch reference would break here due to its frozen
        # input_resolution; our model supports it — verify shape contract.)
        x = RNG.random((1, 20, 28, 1)).astype(np.float32)
        out = model.apply(variables, jnp.asarray(x))
        assert out.shape == (1, 80, 112, 1)

    def test_detect_params_matches_reference_sniffing(self):
        ref, _, _ = make_pair(embed_dim=60, depths=(2, 2))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        det = detect_swinir_params(sd)
        assert det["embed_dim"] == 60
        assert len(det["depths"]) == 2
