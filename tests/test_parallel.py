"""Data-parallel tests on the 8-device virtual CPU mesh (conftest forces it)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from superresolution_def_tpu.parallel import (
    make_mesh,
    replicate,
    shard_batch,
    sync_metrics,
)
from superresolution_def_tpu.train import (
    create_swin_train_state,
    make_swin_train_step,
    cosine_annealing_lr,
)


def _batch(accum, b, lr_size, hr_size, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lr": rng.integers(0, 65535, (accum, b, lr_size, lr_size, 1), dtype=np.uint16),
        "hr": rng.integers(0, 65535, (accum, b, hr_size, hr_size, 1), dtype=np.uint16),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_runs_sharded_and_matches_single_device():
    mesh = make_mesh()
    state, bundle = create_swin_train_state(
        jax.random.PRNGKey(0),
        img_size=16,
        upscale=4,
        embed_dim=16,
        depths=(2,),
        num_heads=(2,),
        window_size=8,
    )
    # donate=False: `state` is stepped single-device AND replicated after
    step = make_swin_train_step(bundle, accum_steps=2, augment=False, donate=False)
    batch = _batch(2, 8, 16, 64)
    lr = cosine_annealing_lr(1)

    # single-device reference
    s_ref, m_ref = step(state, batch, lr, lr)

    # sharded: state replicated, batch sharded over micro-batch axis
    state_dp = replicate(state, mesh)
    batch_dp = shard_batch(batch, mesh, batch_axis=1)
    s_dp, m_dp = step(state_dp, batch_dp, lr, lr)

    # params stay replicated (no per-shard divergence)
    leaf = jax.tree_util.tree_leaves(s_dp.g_params)[0]
    assert leaf.sharding.is_fully_replicated

    np.testing.assert_allclose(
        float(m_dp["loss_g"]), float(m_ref["loss_g"]), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        float(m_dp["loss_d"]), float(m_ref["loss_d"]), rtol=2e-4, atol=2e-5
    )
    # updated params equal up to cross-device reduction order
    ref_leaves = jax.tree_util.tree_leaves(s_ref.g_params)
    dp_leaves = jax.tree_util.tree_leaves(s_dp.g_params)
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)


def test_sync_metrics_single_host_passthrough():
    out = sync_metrics({"psnr_sum": jnp.asarray(4.0), "count": 2})
    assert out == {"psnr_sum": 4.0, "count": 2.0}


# ---- prefetch_to_mesh: the device-staging iterator both production epoch
# loops consume (cli/trainers.py). Replaces the reference's pin_memory +
# async .to(device) (train_swin.py:142-145). ----

def _host_batches(n, accum=2, b=8, size=8):
    for i in range(n):
        rng = np.random.default_rng(i)
        yield {
            "lr": rng.integers(0, 65535, (accum * b, size, size, 1), dtype=np.uint16),
            "hr": rng.integers(0, 65535, (accum * b, size * 4, size * 4, 1), dtype=np.uint16),
        }


def test_prefetch_full_drain_order_and_transform():
    from superresolution_def_tpu.parallel import prefetch_to_mesh

    mesh = make_mesh()
    seen = []
    tf = lambda bt: {k: v.reshape(2, 8, *v.shape[1:]) for k, v in bt.items()}  # noqa: E731
    with prefetch_to_mesh(_host_batches(5), mesh, transform=tf) as stream:
        for host, staged in stream:
            # host batch passes through untouched (pre-transform shape)
            assert host["lr"].shape == (16, 8, 8, 1)
            # staged batch is transformed, device-resident, micro-axis sharded
            assert staged["lr"].shape == (2, 8, 8, 8, 1)
            assert isinstance(staged["lr"], jax.Array)
            assert not staged["lr"].sharding.is_fully_replicated
            seen.append(host["lr"][0, 0, 0, 0])
    assert len(seen) == 5
    # order preserved: batch i was generated with seed i
    for i, v in enumerate(seen):
        ref = np.random.default_rng(i).integers(
            0, 65535, (16, 8, 8, 1), dtype=np.uint16
        )[0, 0, 0, 0]
        assert v == ref


def test_prefetch_early_break_closes_worker_deterministically():
    from superresolution_def_tpu.parallel import prefetch_to_mesh

    mesh = make_mesh()
    produced = []

    def gen():
        for i, bt in enumerate(_host_batches(100)):
            produced.append(i)
            yield bt

    stream = prefetch_to_mesh(gen(), mesh, depth=2)
    for bi, _ in enumerate(stream):
        if bi >= 2:
            break
    stream.close()
    # worker thread has exited (join happened inside close) and stopped
    # consuming: it can be at most consumed(3) + depth(2) + 1 in-flight
    assert not stream._thread.is_alive()
    n_after_close = len(produced)
    assert n_after_close <= 6, produced
    import time as _t
    _t.sleep(0.3)
    assert len(produced) == n_after_close  # no production after close
    # closed iterator terminates cleanly
    assert list(stream) == []


def test_prefetch_relays_producer_exception():
    from superresolution_def_tpu.parallel import prefetch_to_mesh

    mesh = make_mesh()

    def gen():
        yield from _host_batches(2)
        raise OSError("corrupt TIFF mid-epoch")

    got = []
    with pytest.raises(OSError, match="corrupt TIFF"):
        with prefetch_to_mesh(gen(), mesh) as stream:
            for host, _ in stream:
                got.append(host)
    assert len(got) == 2  # both good batches arrived before the relay


def test_prefetch_exception_in_consumer_body_still_cleans_up():
    from superresolution_def_tpu.parallel import prefetch_to_mesh

    mesh = make_mesh()
    stream = prefetch_to_mesh(_host_batches(50), mesh, depth=2)
    with pytest.raises(ValueError):
        with stream:
            for _ in stream:
                raise ValueError("step blew up")
    assert not stream._thread.is_alive()


def test_fused_generator_shard_map_matches_unfused_dp():
    """fused=True + fused_mesh: the Pallas generator runs per-shard under
    shard_map on the DP mesh; losses match the unfused sharded step."""
    import pytest
    from jax.experimental.pallas import tpu as pltpu

    mesh = make_mesh()
    kwargs = dict(
        img_size=16, upscale=4, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=8,
    )
    s0, b0 = create_swin_train_state(jax.random.PRNGKey(0), **kwargs)
    s1, b1 = create_swin_train_state(
        jax.random.PRNGKey(0), **kwargs, fused=True, fused_mesh=mesh
    )
    step0 = make_swin_train_step(b0, accum_steps=2, augment=False)
    step1 = make_swin_train_step(b1, accum_steps=2, augment=False)
    batch = _batch(2, 8, 16, 64)
    lr = cosine_annealing_lr(1)

    s0r = replicate(s0, mesh)
    s1r = replicate(s1, mesh)
    bd = shard_batch(batch, mesh, batch_axis=1)
    _, m0 = step0(s0r, bd, lr, lr)
    with pltpu.force_tpu_interpret_mode():
        _, m1 = step1(s1r, bd, lr, lr)
    np.testing.assert_allclose(
        float(m1["loss_g"]), float(m0["loss_g"]), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        float(m1["loss_d"]), float(m0["loss_d"]), rtol=5e-4, atol=5e-5
    )


def test_hybrid_fused_shard_map_forward_matches_single():
    """Hybrid fused path (flax HAT + fused trunk) per-shard under shard_map
    on the DP mesh: sharded forward == single-device fused forward.

    NOTE: fused_interpret=True already routes every pallas_call through the
    pure-XLA interpret path; do NOT additionally wrap in
    pltpu.force_tpu_interpret_mode() — that switches to the callback-based
    TPU emulator whose shared interpreter state deadlocks under concurrent
    multi-device shard_map execution (round-2 futex deadlock).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from superresolution_def_tpu.train import create_hat_train_state

    mesh = make_mesh()
    kwargs = dict(
        img_size=64, embed_dim=30, depths=(2,), num_heads=(6,), window_size=8,
        num_rrdb=1, num_feat=16, num_grow_ch=8,
    )
    s0, b0 = create_hat_train_state(
        jax.random.PRNGKey(0), **kwargs, fused=True, fused_interpret=True
    )
    s1, b1 = create_hat_train_state(
        jax.random.PRNGKey(0), **kwargs, fused=True, fused_interpret=True,
        fused_mesh=mesh,
    )
    x = jnp.asarray(np.random.default_rng(3).random((8, 64, 64, 1), np.float32))
    ref = b0.g_apply({"params": s0.g_params}, x, True)
    params_r = replicate(s1.g_params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P(mesh.axis_names[0])))
    got = b1.g_apply({"params": params_r}, xs, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-5, rtol=2e-4
    )


@pytest.mark.slow
def test_hybrid_fused_shard_map_gradients_match_single_device():
    """GRADIENTS of the fused hybrid generator (custom-VJP trunk) under
    shard_map on the DP mesh vs the same loss on one device: autodiff
    through shard_map must insert the psum that makes replicated-param
    grads equal the full-batch grads. This is the one novel interaction
    in the path cli/trainers.py auto-enables for multi-device TPU bf16
    hybrid runs — the optimizer/D/scan plumbing around it is already
    validated by the swin mesh step test (exact-vs-unfused above) and by
    the single-device hybrid step tests (tests/test_train_steps.py,
    tests/test_fused_hat_train.py: fused == flax gradients).

    drop_path_rate=0 so per-shard rng fold-in is irrelevant. (Full
    train-step variants were tried and abandoned: one interpret-mode
    hybrid train step takes >1h on the 1-core CPU host, and the unfused
    mesh reference's GSPMD compile alone exceeds an hour.)"""
    from superresolution_def_tpu.train import create_hat_train_state

    mesh = make_mesh()
    kwargs = dict(
        img_size=64, embed_dim=30, depths=(2,), num_heads=(6,), window_size=8,
        num_rrdb=1, num_feat=16, num_grow_ch=8, drop_path_rate=0.0,
        fused=True, fused_interpret=True,
    )
    s0, b0 = create_hat_train_state(jax.random.PRNGKey(0), **kwargs)
    s1, b1 = create_hat_train_state(jax.random.PRNGKey(0), **kwargs, fused_mesh=mesh)
    x = jnp.asarray(np.random.default_rng(3).random((8, 64, 64, 1), np.float32))
    tgt = jnp.asarray(np.random.default_rng(4).random((8, 256, 256, 1), np.float32))

    def loss0(p, xx, tt):
        return jnp.mean(jnp.abs(b0.g_apply({"params": p}, xx, True) - tt))

    def loss1(p, xx, tt):
        return jnp.mean(jnp.abs(b1.g_apply({"params": p}, xx, True) - tt))

    l0, g0 = jax.jit(jax.value_and_grad(loss0))(s0.g_params, x, tgt)

    from jax.sharding import NamedSharding, PartitionSpec as P

    params_r = replicate(s1.g_params, mesh)
    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    xs = jax.device_put(x, sh)
    ts = jax.device_put(tgt, sh)
    l1, g1 = jax.jit(jax.value_and_grad(loss1))(params_r, xs, ts)

    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5, atol=1e-6)
    leaf = jax.tree_util.tree_leaves(g1)[0]
    assert leaf.sharding.is_fully_replicated
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
