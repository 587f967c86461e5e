"""Learned collision models: continuous occupancy map + self-collision predictor.

Counterpart of reference ``src/models/robot_learning/`` (``continuous_occupancy
_map.py:10-144``, ``continuous_self_collision_pred.py:11-174``): small MLPs
``R³→[0,1]`` (world-point occupancy probability) and ``R^dof→[0,1]``
(self-collision probability), trained with class-weighted BCE. The
pytorch-lightning trainer becomes a jitted optax loop; checkpoints are flax
msgpack files.

The networks are the MPC hot path's cost terms — at 1k particles × 200
timesteps × 90 body points the forward pass is a few large matmuls that map
straight onto the MXU.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import serialization


class ProbMLP(nn.Module):
    """ReLU MLP with sigmoid head (reference: 5×200 + Sigmoid,
    ``continuous_occupancy_map.py:10-34``)."""

    features: Sequence[int] = (200, 200, 200, 200, 200)

    @nn.compact
    def __call__(self, x, logits: bool = False):
        for f in self.features:
            x = nn.relu(nn.Dense(f)(x))
        x = nn.Dense(1)(x)
        return x if logits else nn.sigmoid(x)


@dataclasses.dataclass(frozen=True, eq=False)
class ProbModel:
    """A trained probability model: apply with ``model(x) -> [..., 1]``."""

    module: ProbMLP
    params: Any

    def __call__(self, x: jax.Array, logits: bool = False) -> jax.Array:
        return self.module.apply({"params": self.params}, x, logits=logits)

    def save(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_bytes(serialization.to_bytes(self.params))

    @staticmethod
    def load(path: str | Path, in_dim: int, features=(200,) * 5) -> "ProbModel":
        module = ProbMLP(features=tuple(features))
        template = module.init(jax.random.PRNGKey(0), jnp.zeros((1, in_dim)))[
            "params"
        ]
        params = serialization.from_bytes(template, Path(path).read_bytes())
        return ProbModel(module=module, params=params)


def train_prob_model(
    key: jax.Array,
    inputs: np.ndarray,
    labels: np.ndarray,
    *,
    features: Sequence[int] = (200,) * 5,
    batch_size: int = 4096,
    epochs: int = 20,
    lr: float = 1e-3,
    pos_weight: Optional[float] = None,
    log_every: int = 0,
) -> ProbModel:
    """Class-weighted BCE training loop (parity:
    ``continuous_occupancy_map.py:37-125`` — the reference weights classes by
    inverse frequency; ``pos_weight=None`` reproduces that automatically).
    """
    inputs = np.asarray(inputs, np.float32)
    labels = np.asarray(labels, np.float32).reshape(-1)
    n = inputs.shape[0]
    if pos_weight is None:
        pos_frac = max(labels.mean(), 1e-6)
        pos_weight = float((1.0 - pos_frac) / pos_frac)

    module = ProbMLP(features=tuple(features))
    params = module.init(key, jnp.zeros((1, inputs.shape[1])))["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    x_dev = jnp.asarray(inputs)
    y_dev = jnp.asarray(labels)
    steps_per_epoch = max(n // batch_size, 1)
    n_steps = epochs * steps_per_epoch

    # the whole training run is ONE lax.scan (one dispatch): per-step random
    # minibatch gather on-device — a Python per-batch loop pays a dispatch
    # round-trip per step, which dominates at these model sizes
    @jax.jit
    def train(params, opt_state, key):
        def step(carry, step_key):
            params, opt_state = carry
            idx = jax.random.randint(step_key, (batch_size,), 0, n)
            xb = x_dev[idx]
            yb = y_dev[idx]

            def loss_fn(p):
                logits = module.apply({"params": p}, xb, logits=True)[..., 0]
                losses = optax.sigmoid_binary_cross_entropy(logits, yb)
                w = jnp.where(yb > 0.5, pos_weight, 1.0)
                return jnp.mean(w * losses)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jax.random.split(key, n_steps)
        )
        return params, losses

    params, losses = train(params, opt_state, jax.random.fold_in(key, 1))
    if log_every:
        epoch_losses = np.asarray(losses).reshape(epochs, steps_per_epoch).mean(1)
        for e in range(0, epochs, log_every):
            print(f"epoch {e + 1}: loss {epoch_losses[e]:.4f}")
    return ProbModel(module=module, params=params)
