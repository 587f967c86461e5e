"""Batched horizon rollouts: ``lax.scan`` over time, broadcasting over batch.

The reference's hot loop (``src/controllers/dust.py:250-306`` /
``disco.py:138-193``) is a Python ``for t in range(hz_len)`` with a
``torch.cat`` per step; here the whole horizon compiles to a single fused
scan whose per-step body is the model's vectorized ``step``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .base import DynamicsModel, ParamsDict


def rollout(
    model: DynamicsModel,
    init_state: jax.Array,
    actions: jax.Array,
    params: ParamsDict = None,
    key: Optional[jax.Array] = None,
    unroll: int = 8,
) -> jax.Array:
    """Roll the model forward under an action sequence.

    Args:
      model: dynamics model (static).
      init_state: ``[..., dim_s]`` initial states (any batch shape).
      actions: ``[..., H, dim_a]`` action sequences (batch dims broadcast
        against ``init_state``'s).
      params: optional uncertain-parameter dict with leaves broadcastable
        against the batch.
      key: optional PRNG key for stochastic models (split over the horizon).

    Returns:
      states ``[..., H+1, dim_s]`` including the initial state.
    """
    h = actions.shape[-2]
    batch = jnp.broadcast_shapes(init_state.shape[:-1], actions.shape[:-2])
    state0 = jnp.broadcast_to(init_state, batch + init_state.shape[-1:])
    acts = jnp.moveaxis(
        jnp.broadcast_to(actions, batch + actions.shape[-2:]), -2, 0
    )  # [H, ..., dim_a]

    if key is not None:
        keys = jax.random.split(key, h)
    else:
        keys = jnp.zeros((h, 2), jnp.uint32)

    def body(state, inp):
        act, k = inp
        nxt = model.step(state, act, params, key=k if key is not None else None)
        return nxt, nxt

    # unrolling amortizes the per-iteration device-loop overhead, which
    # dominates at MPC shapes (tiny [batch, dim] elementwise steps)
    _, traj = lax.scan(body, state0, (acts, keys), unroll=min(unroll, h))
    traj = jnp.moveaxis(traj, 0, -2)  # [..., H, dim_s]
    return jnp.concatenate([state0[..., None, :], traj], axis=-2)
