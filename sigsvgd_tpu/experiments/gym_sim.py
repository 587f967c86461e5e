"""Closed-loop MPC against OpenAI Gymnasium environments.

Counterpart of the reference's ``run_gym_simulation``
(``src/utils/_experiments.py:9-85``): the controller plans with OUR
differentiable model while the *environment transition* is gymnasium's own
physics — an external-simulator cross-check that the dynamics models match
the ecosystem's ground truth (model-step parity is asserted separately in
``tests/test_gym_crossval.py``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def gym_pendulum_model(dt: float = 0.05):
    """Our PendulumModel configured to gymnasium Pendulum-v1's constants
    (g=10; the classic-control dynamics are otherwise identical to the
    reference's, ``src/models/pendulum.py:59-98``)."""
    from ..models.pendulum import PendulumModel

    return PendulumModel(dt=dt, g=10.0, mass=1.0, length=1.0)


def run_gym_pendulum(
    controller,
    cstate,
    n_steps: int = 200,
    seed: int = 0,
    opt_steps: int = 2,
    key: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Closed-loop DuSt swing-up where gymnasium Pendulum-v1 is the system.

    The env is reset to the hanging-down state (θ=π, θ̇=0) like the
    reference's gym runs; per step the controller solves from the env's true
    state and the env applies the first action.
    """
    import gymnasium as gym

    env = gym.make("Pendulum-v1")
    env.reset(seed=seed)
    env.unwrapped.state = np.array([np.pi, 0.0])
    state = jnp.asarray(env.unwrapped.state, jnp.float32)

    if key is None:
        key = jax.random.PRNGKey(seed)

    @jax.jit
    def solve(state, cstate, key):
        a_seq, cstate, _ = controller.forward(
            state, cstate, None, key, opt_steps=opt_steps
        )
        return a_seq[0], cstate

    keys = jax.random.split(key, n_steps)
    states, actions, rewards = [np.asarray(state)], [], []
    for t in range(n_steps):
        action, cstate = solve(state, cstate, keys[t])
        a_np = np.asarray(action)
        _, reward, _, _, _ = env.step(a_np)
        state = jnp.asarray(env.unwrapped.state, jnp.float32)
        states.append(np.asarray(state))
        actions.append(a_np)
        rewards.append(float(reward))
    env.close()
    return {
        "states": np.stack(states),
        "actions": np.stack(actions),
        "rewards": np.asarray(rewards),
    }
