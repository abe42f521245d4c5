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
