"""Golden tests for the core ops against torch reference semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

import torch
import torch.nn.functional as F

from superresolution_def_tpu.ops import (
    window_partition,
    window_reverse,
    relative_position_index_sa,
    relative_position_index_oca,
    shift_window_attn_mask,
    pixel_shuffle,
    pixel_unshuffle,
    interpolate_nearest,
    interpolate_bilinear,
    resize_nearest,
    reflect_pad_2d,
    psnr,
    ssim,
    TrainMetrics,
)

RNG = np.random.default_rng(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2).copy())


def nhwc(x_nchw_torch):
    return x_nchw_torch.detach().numpy().transpose(0, 2, 3, 1)


class TestWindows:
    def test_partition_reverse_roundtrip(self):
        x = RNG.standard_normal((2, 16, 24, 5)).astype(np.float32)
        w = window_partition(jnp.asarray(x), 8)
        assert w.shape == (2 * 2 * 3, 8, 8, 5)
        back = window_reverse(w, 8, 16, 24)
        np.testing.assert_array_equal(np.asarray(back), x)

    def test_partition_matches_torch_ordering(self):
        # torch: view(b, h//ws, ws, w//ws, ws, c).permute(0,1,3,2,4,5)
        x = RNG.standard_normal((2, 16, 16, 3)).astype(np.float32)
        t = torch.from_numpy(x)
        ws = 8
        tw = t.view(2, 2, ws, 2, ws, 3).permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, 3)
        ours = window_partition(jnp.asarray(x), ws)
        np.testing.assert_array_equal(np.asarray(ours), tw.numpy())

    def test_rpi_sa_matches_torch(self):
        ws = 8
        coords = torch.stack(torch.meshgrid([torch.arange(ws), torch.arange(ws)], indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        expected = rel.sum(-1).numpy()
        np.testing.assert_array_equal(relative_position_index_sa(ws), expected)
        assert relative_position_index_sa(ws).max() < (2 * ws - 1) ** 2

    def test_rpi_oca_matches_torch_wraparound(self):
        # The reference's calculate_rpi_oca yields negative indices that torch
        # wraps python-style into the (ws+wse-1)^2-entry table; we reproduce
        # with modulo. Verify against an actual torch gather.
        ws, ratio = 8, 0.5
        wse = ws + int(ratio * ws)
        table_size = (ws + wse - 1) ** 2

        coords_ori = torch.stack(
            torch.meshgrid([torch.arange(ws), torch.arange(ws)], indexing="ij")
        ).flatten(1)
        coords_ext = torch.stack(
            torch.meshgrid([torch.arange(wse), torch.arange(wse)], indexing="ij")
        ).flatten(1)
        rel = coords_ext[:, None, :] - coords_ori[:, :, None]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - wse + 1
        rel[:, :, 1] += ws - wse + 1
        rel[:, :, 0] *= ws + wse - 1
        torch_idx = rel.sum(-1)

        table = torch.arange(table_size, dtype=torch.float32)[:, None]
        gathered_torch = table[torch_idx.view(-1)].view(ws * ws, wse * wse).numpy()

        ours = relative_position_index_oca(ws, ratio)
        assert ours.shape == (ws * ws, wse * wse)
        assert ours.min() >= 0 and ours.max() < table_size
        np.testing.assert_array_equal(ours.astype(np.float32), gathered_torch)

    def test_shift_mask_values(self):
        mask = shift_window_attn_mask(16, 16, 8, 4)
        assert mask.shape == (4, 64, 64)
        assert set(np.unique(mask)) <= {-100.0, 0.0}
        # first window (interior) is unmasked
        assert np.all(mask[0] == 0)


class TestPixelShuffle:
    def test_matches_torch(self):
        x = RNG.standard_normal((2, 4, 6, 3 * 4)).astype(np.float32)
        expected = F.pixel_shuffle(nchw(x), 2)
        ours = pixel_shuffle(jnp.asarray(x), 2)
        np.testing.assert_allclose(np.asarray(ours), nhwc(expected), atol=0)

    def test_roundtrip(self):
        x = RNG.standard_normal((1, 8, 8, 16)).astype(np.float32)
        y = pixel_unshuffle(pixel_shuffle(jnp.asarray(x), 4), 4)
        np.testing.assert_array_equal(np.asarray(y), x)


class TestResize:
    def test_nearest_matches_torch(self):
        x = RNG.standard_normal((2, 5, 7, 3)).astype(np.float32)
        for size in [(10, 14), (20, 28), (13, 9)]:
            expected = F.interpolate(nchw(x), size=size, mode="nearest")
            ours = interpolate_nearest(jnp.asarray(x), size)
            np.testing.assert_allclose(np.asarray(ours), nhwc(expected), atol=0)

    def test_resize_nearest_integer_scale(self):
        x = RNG.standard_normal((2, 4, 4, 3)).astype(np.float32)
        expected = F.interpolate(nchw(x), scale_factor=2, mode="nearest")
        ours = resize_nearest(jnp.asarray(x), 2)
        np.testing.assert_allclose(np.asarray(ours), nhwc(expected), atol=0)

    @pytest.mark.parametrize("align", [True, False])
    def test_bilinear_matches_torch(self, align):
        x = RNG.standard_normal((2, 6, 5, 3)).astype(np.float32)
        for size in [(12, 10), (7, 9), (3, 4)]:
            expected = F.interpolate(nchw(x), size=size, mode="bilinear", align_corners=align)
            ours = interpolate_bilinear(jnp.asarray(x), size, align_corners=align)
            np.testing.assert_allclose(np.asarray(ours), nhwc(expected), atol=2e-6)


class TestPadding:
    def test_reflect_matches_torch(self):
        x = RNG.standard_normal((2, 10, 12, 1)).astype(np.float32)
        expected = F.pad(nchw(x), (0, 3, 0, 5), mode="reflect")
        ours = reflect_pad_2d(jnp.asarray(x), 5, 3)
        np.testing.assert_allclose(np.asarray(ours), nhwc(expected), atol=0)


class TestMetrics:
    def test_psnr_matches_reference_formula(self):
        p = RNG.random((4, 32, 32, 1)).astype(np.float32)
        t = RNG.random((4, 32, 32, 1)).astype(np.float32)
        tp, tt = nchw(p), nchw(t)
        mse = F.mse_loss(tp.clamp(0, 1), tt.clamp(0, 1), reduction="none").mean(dim=[1, 2, 3])
        expected = (10 * torch.log10(1.0 / (mse + 1e-8))).numpy()
        ours = np.asarray(psnr(jnp.asarray(p), jnp.asarray(t)))
        # fp32 accumulation-order drift only; the quality gate is 0.01 dB.
        np.testing.assert_allclose(ours, expected, atol=1e-3)

    def test_ssim_matches_reference(self):
        from tests._torch_ref import load_reference_metrics

        _, ssim_torch = load_reference_metrics()
        p = RNG.random((2, 48, 48, 1)).astype(np.float32)
        t = (p + 0.05 * RNG.standard_normal(p.shape)).astype(np.float32).clip(0, 1)
        expected = ssim_torch(nchw(p), nchw(t)).item()
        ours = float(ssim(jnp.asarray(p), jnp.asarray(t)))
        assert abs(ours - expected) < 1e-4

    def test_train_metrics_accumulator_matches_reference(self):
        from tests._torch_ref import load_reference_metrics

        RefMetrics, _ = load_reference_metrics()
        ref = RefMetrics()
        ours = TrainMetrics()
        for _ in range(3):
            p = RNG.random((2, 48, 48, 1)).astype(np.float32)
            t = RNG.random((2, 48, 48, 1)).astype(np.float32)
            ref.update(nchw(p), nchw(t))
            ours.update(jnp.asarray(p), jnp.asarray(t))
        r, o = ref.compute(), ours.compute()
        assert abs(r["psnr"] - o["psnr"]) < 1e-3
        assert abs(r["ssim"] - o["ssim"]) < 1e-5

    def test_metrics_accept_bf16_inputs(self):
        """bf16 model outputs must upcast inside psnr/ssim (the HAT train
        step feeds bf16 sr into the live metric tracker; regression for a
        dtype crash in _depthwise_valid_conv)."""
        p = RNG.random((2, 48, 48, 1)).astype(np.float32)
        t = (p + 0.05 * RNG.standard_normal(p.shape)).astype(np.float32).clip(0, 1)
        pj, tj = jnp.asarray(p), jnp.asarray(t)
        pb, tb = pj.astype(jnp.bfloat16), tj.astype(jnp.bfloat16)
        s32, sbf = float(ssim(pj, tj)), float(ssim(pb, tb))
        assert sbf == pytest.approx(s32, abs=5e-3)
        n32 = np.asarray(psnr(pj, tj))
        nbf = np.asarray(psnr(pb, tb))
        assert nbf.dtype == np.float32
        np.testing.assert_allclose(nbf, n32, atol=0.5)  # bf16 quantization only
