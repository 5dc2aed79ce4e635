"""EMA of generator params as a pure pytree map.

Reference semantics (train_swin.py:45-74 ModelEMA / train_hat.py:76-79
update_ema): shadow = decay * shadow + (1 - decay) * param, decay 0.999,
updated once per *optimizer* step (i.e. per accumulation window). The swin
trainer validates and saves 'best' from the EMA shadow; the HAT trainer
keeps a frozen EMA twin saved as best_hybrid_model_EMA.pth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EMA_DECAY = 0.999


def ema_init(params):
    # materialize a COPY, not an alias: the train steps donate the whole
    # state (jit donate_argnums), and two pytree leaves sharing one buffer
    # make donation reject the call ("donate the same buffer twice")
    return jax.tree_util.tree_map(jnp.array, params)


def ema_update(shadow, params, decay: float = EMA_DECAY):
    return jax.tree_util.tree_map(
        lambda s, p: decay * s + (1.0 - decay) * p, shadow, params
    )
