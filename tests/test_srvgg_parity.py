"""SRVGGNetCompact forward parity vs the torch reference oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from superresolution_def_tpu.models import SRVGGNetCompact
from superresolution_def_tpu.models.torch_port import srvgg_from_torch
from tests._torch_ref import load_reference_srvgg

RNG = np.random.default_rng(9)



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

@pytest.mark.parametrize("act", ["prelu", "relu", "leakyrelu"])
def test_srvgg_matches_torch(act):
    Ref = load_reference_srvgg()
    torch.manual_seed(0)
    ref = Ref(num_in_ch=1, num_out_ch=1, num_feat=12, num_conv=3, upscale=4,
              act_type=act).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = srvgg_from_torch(sd, num_conv=3)

    model = SRVGGNetCompact(num_in_ch=1, num_out_ch=1, num_feat=12, num_conv=3,
                            upscale=4, act_type=act)
    x = RNG.random((2, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    ours = model.apply({"params": params}, jnp.asarray(x))
    err = np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - expected.numpy())
    assert err.max() < 2e-5, f"{act}: max abs err {err.max()}"
