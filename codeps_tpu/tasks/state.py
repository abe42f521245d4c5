"""Training state pytrees."""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    """Pretraining state: params/batch_stats keyed by module name
    (mirrors the reference checkpoint granularity,
    codeps/online_adap.py:438-455)."""
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: optax.OptState
    step: jnp.ndarray
    rng: jax.Array


@flax.struct.dataclass
class AdaptState:
    """Online-adaptation state.

    Carries the EMA teacher and the rolling pose-distance buffer that
    implements the reference's non-moving-frame skip
    (algos/depth.py:537-558) as traced state instead of a Python list.
    """
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    ema_params: Dict[str, Any]
    ema_batch_stats: Dict[str, Any]
    opt_state: optax.OptState
    step: jnp.ndarray
    rng: jax.Array
    # Rolling buffer of camera translation norms (length 300, ring buffer).
    dist_buffer: jnp.ndarray      # (300,) float32
    dist_count: jnp.ndarray       # int32: number of valid entries
    dist_head: jnp.ndarray        # int32: ring write position
    # Per-module EMA blend factor (traced): ema_alpha for EMA-filtered
    # modules, 0 (copy student) otherwise, 1 (keep) for frozen modules —
    # adapt_codeps.py:294-299. Kept as runtime state so XLA cannot
    # constant-fold the blend into an output that aliases the student
    # params (donation forbids aliased buffers).
    ema_alpha: Dict[str, jnp.ndarray]


def make_adapt_state(params, batch_stats, tx, rng, ema_modules=(),
                     frozen_modules=(), ema_alpha: float = 0.99,
                     dist_buffer_len: int = 300) -> AdaptState:
    """Build a fresh AdaptState with an EMA teacher copy.

    The teacher trees are materialized as *distinct* buffers — the adapt
    step donates its input state, and donation rejects two arguments
    aliasing one buffer ("attempt to donate the same buffer twice").
    """
    ema_params = jax.tree.map(jnp.array, params)
    ema_stats = jax.tree.map(jnp.array, batch_stats)
    alphas = {}
    for name in params:
        if name in ema_modules:
            alphas[name] = jnp.asarray(ema_alpha, jnp.float32)
        elif name in frozen_modules:
            alphas[name] = jnp.asarray(1.0, jnp.float32)
        else:
            alphas[name] = jnp.asarray(0.0, jnp.float32)
    return AdaptState(
        params=params, batch_stats=batch_stats, ema_params=ema_params,
        ema_batch_stats=ema_stats, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), rng=rng,
        dist_buffer=jnp.zeros((dist_buffer_len,), jnp.float32),
        dist_count=jnp.zeros((), jnp.int32),
        dist_head=jnp.zeros((), jnp.int32),
        ema_alpha=alphas)
