"""Stable trunk-variant bench: rerun until all rows print (compile cache
makes each rerun resume where the last timed out). Results feed PERF.md."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np
import jax
import jax.numpy as jnp

from superresolution_def_tpu.models import HybridHATRealESRGAN
from superresolution_def_tpu.kernels.fused_hat import _conv3

DTYPE = jnp.bfloat16
F, G = 48, 24


def chained(fn, x, n=12):
    @jax.jit
    def loop(x0):
        def body(_, c):
            return fn(c)

        return jax.lax.fori_loop(0, n, body, x0)

    loop(x).block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        loop(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    model = HybridHATRealESRGAN(
        img_size=128, in_chans=1, embed_dim=90, depths=(6, 6, 6, 6),
        num_heads=(6, 6, 6, 6), window_size=8, upscale=4,
        num_rrdb=12, num_feat=48, num_grow_ch=24, dtype=DTYPE,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1), jnp.float32))["params"]

    def rdb_naive(p, x):
        def lrelu2(v):
            return jnp.where(v >= 0, v, v * 0.2)

        x1 = lrelu2(_conv3(p["conv1"], x))
        x2 = lrelu2(_conv3(p["conv2"], jnp.concatenate([x, x1], -1)))
        x3 = lrelu2(_conv3(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu2(_conv3(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = _conv3(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x

    def rdb_packed_bf16(p, x):
        ks = [p[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6)]
        bs = [p[f"conv{i}"]["conv"]["bias"] for i in range(1, 6)]
        offs = [0, F, F + G, F + 2 * G, F + 3 * G]
        sizes = [F, G, G, G, G]

        def conv(v, k):
            return jax.lax.conv_general_dilated(
                v.astype(DTYPE), k.astype(DTYPE), (1, 1),
                padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        acc = [None] * 5
        cur = x
        for s in range(5):
            pack = jnp.concatenate(
                [ks[i][:, :, offs[s] : offs[s] + sizes[s], :] for i in range(s, 5)], -1
            )
            y = conv(cur, pack)
            pos = 0
            for i in range(s, 5):
                w = ks[i].shape[-1]
                part = y[..., pos : pos + w]
                acc[i] = part if acc[i] is None else acc[i] + part
                pos += w
            pre = acc[s] + bs[s].astype(DTYPE)
            cur = jnp.where(pre >= 0, pre, pre * 0.2) if s < 4 else pre
        return cur * 0.2 + x

    def make_trunk(rdb_fn):
        def t_fn(x):
            t = x
            for r in range(12):
                p = params[f"rrdb_trunk_{r}"]
                t = rdb_fn(p["rdb1"], t)
                t = rdb_fn(p["rdb2"], t)
                t = rdb_fn(p["rdb3"], t)
            return t

        return t_fn

    xt = jnp.zeros((8, 256, 256, 48), DTYPE)
    if which in ("all", "naive"):
        t = chained(make_trunk(rdb_naive), xt)
        print(f"trunk_naive     : {t*1000:.1f} ms ({8/t:.1f} p/s)", flush=True)
    if which in ("all", "packed"):
        t = chained(make_trunk(rdb_packed_bf16), xt)
        print(f"trunk_packed_b16: {t*1000:.1f} ms ({8/t:.1f} p/s)", flush=True)
    if which in ("all", "kernel"):
        from superresolution_def_tpu.kernels.fused_rdb import fused_rrdb_trunk

        t = chained(lambda c: fused_rrdb_trunk(params, c, 12), xt)
        print(f"trunk_fused_rdb : {t*1000:.1f} ms ({8/t:.1f} p/s)", flush=True)
    if which.startswith("cm"):
        from superresolution_def_tpu.kernels.fused_rdb_cm import fused_rrdb_trunk_cm

        tile_h = int(which[2:]) if len(which) > 2 else 64
        t = chained(lambda c: fused_rrdb_trunk_cm(params, c, 12, tile_h=tile_h), xt)
        print(f"trunk_cm th={tile_h:<3d}: {t*1000:.1f} ms ({8/t:.1f} p/s)", flush=True)


if __name__ == "__main__":
    main()
