"""Window-attention geometry ops (NHWC, static shapes, jit-friendly).

Implements the window math used by Swin/HAT-style local attention:
partition/reverse, relative-position index tables, and the shifted-window
attention mask.

Behavioral reference (capability parity, not a translation):
  /root/reference/models/architecture_swin.py:27-37 (partition/reverse),
  :51-61 (relative position index);
  /root/reference/models/hat_arch/hat_arch.py:882-940 (rpi_sa/rpi_oca/mask).

All tables are computed with numpy at trace time and baked into the program
as constants — on TPU they live in HBM/VMEM as read-only operands and are
folded by XLA, so nothing here is a runtime cost.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nWh * nWw, ws, ws, C).

    Pure reshape/transpose — XLA lowers this to a layout change, no copy on
    the megacore path when fused into the consumer.
    """
    b, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c)


def window_reverse(windows: jnp.ndarray, window_size: int, h: int, w: int) -> jnp.ndarray:
    """(B * nWh * nWw, ws, ws, C) -> (B, H, W, C)."""
    ws = window_size
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index_sa(window_size: int) -> np.ndarray:
    """Self-attention relative-position index table, (ws*ws, ws*ws) int32.

    Index into a bias table of size (2*ws-1)**2. Matches the standard Swin
    construction (reference architecture_swin.py:51-61).
    """
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, ws*ws)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)  # (N, N, 2)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1).astype(np.int32)


def relative_position_index_oca(window_size: int, overlap_ratio: float) -> np.ndarray:
    """Overlapping cross-attention relative-position index, (ws*ws, wse*wse).

    Queries live on the ws x ws grid; keys on the enlarged
    wse = ws + int(overlap_ratio*ws) grid. Index into a bias table of size
    (ws + wse - 1)**2 (reference hat_arch.py:896-919).
    """
    ws = window_size
    wse = ws + int(overlap_ratio * ws)

    coords_ori = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords_ori = coords_ori.reshape(2, -1)  # (2, ws*ws)
    coords_ext = np.stack(np.meshgrid(np.arange(wse), np.arange(wse), indexing="ij"))
    coords_ext = coords_ext.reshape(2, -1)  # (2, wse*wse)

    rel = coords_ext[:, None, :] - coords_ori[:, :, None]  # (2, ws*ws, wse*wse)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - wse + 1
    rel[:, :, 1] += ws - wse + 1
    rel[:, :, 0] *= ws + wse - 1
    idx = rel.sum(-1)
    # Reference quirk (hat_arch.py:914-918): the shift constant ws - wse + 1
    # leaves indices as negative as -(wse-2)*(ws+wse) ... torch then indexes
    # the (ws+wse-1)^2-row bias table with python-style negative wraparound.
    # The resulting map is a bijection onto [0, (ws+wse-1)^2); we reproduce it
    # with an explicit modulo so gathers are valid on TPU.
    table_size = (ws + wse - 1) ** 2
    return np.mod(idx, table_size).astype(np.int32)


def shift_window_attn_mask(h: int, w: int, window_size: int, shift_size: int) -> np.ndarray:
    """Attention mask for shifted windows, (nW, ws*ws, ws*ws) float32.

    0 where query/key belong to the same pre-shift region, -100 otherwise
    (reference hat_arch.py:921-940). Static per image size — computed host
    side and folded into the compiled program.
    """
    ws, ss = window_size, shift_size
    img_mask = np.zeros((1, h, w, 1), dtype=np.float32)
    h_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    w_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    cnt = 0
    for hs in h_slices:
        for wsl in w_slices:
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1

    # numpy window_partition
    m = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = m[:, None, :] - m[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
