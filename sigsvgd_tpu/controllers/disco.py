"""DISCO — information-theoretic MPC (MPPI variant), TPU-native.

Counterpart of reference ``src/controllers/disco.py:13-400`` (Williams et al.
2017 IT-MPC): sample perturbed action sequences, roll them through the model
(optionally over sampled dynamics parameters or unscented sigma points),
weight by exponentiated utility, and blend the perturbations into the plan.

Functional design: the controller is static config; the plan lives in
:class:`DISCOState`; ``forward`` + ``act`` are pure jittable functions whose
horizon rollout is a single ``lax.scan`` (the reference's per-step Python loop
+ ``torch.cat``, ``disco.py:181-188``, becomes one fused XLA program).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.base import DynamicsModel
from ..models.rollout import rollout
from ..utils import distributions as du
from ..utils.utf import MerweScaledUTF

CostFn = Callable[..., jax.Array]


class DISCOState(NamedTuple):
    a_seq: jax.Array  # [H, dim_a] current plan


class DISCOData(NamedTuple):
    costs: jax.Array  # [n_actions]
    states: jax.Array  # [..., H+1, dim_s] sampled rollouts
    actions: jax.Array  # [n_actions, H, dim_a]
    omega: jax.Array  # [n_actions] softmax weights


@dataclasses.dataclass(frozen=True)
class DISCO:
    model: DynamicsModel
    hz_len: int
    n_actions: int  # sampled action sequences per solve
    pol_cov: Tuple[Tuple[float, ...], ...] = ()  # [a, a]; empty = identity
    temperature: float = 1.0
    ctrl_penalty: float = 1.0
    n_params: int = 0  # dynamics-parameter MC samples (0 = defaults)
    params_log_space: bool = False
    utf: Optional[MerweScaledUTF] = None  # sigma-point rollouts instead of MC
    inst_cost_fn: Optional[CostFn] = None
    term_cost_fn: Optional[CostFn] = None

    @property
    def dim_a(self) -> int:
        return self.model.dim_a

    def _pol_cov(self) -> jax.Array:
        if self.pol_cov:
            return jnp.asarray(self.pol_cov, jnp.float32)
        return jnp.eye(self.dim_a, dtype=jnp.float32)

    def init(self, init_policy: Optional[jax.Array] = None) -> DISCOState:
        a = (
            init_policy
            if init_policy is not None
            else jnp.zeros((self.hz_len, self.dim_a), jnp.float32)
        )
        return DISCOState(a_seq=a)

    # -- cost helpers ------------------------------------------------------
    def _inst(self, states, actions):
        if self.inst_cost_fn is None:
            return jnp.zeros(states.shape[:-1], states.dtype)
        return self.inst_cost_fn(states, actions)

    def _term(self, states):
        if self.term_cost_fn is None:
            return jnp.zeros(states.shape[:-1], states.dtype)
        return self.term_cost_fn(states)

    def _params_dict(self, mat: jax.Array, extra_batch_dims: int):
        """``[k, p]`` sample matrix → params dict broadcastable against a
        ``[k, *batch]`` rollout shape."""
        cols = self.model.params_to_dict(mat)
        shape = (-1,) + (1,) * (extra_batch_dims + 1)
        return {k: v.reshape(shape) for k, v in cols.items()}

    # -- solve -------------------------------------------------------------
    def forward(
        self,
        state: jax.Array,
        ctrl: DISCOState,
        params_dist: Optional[du.Distribution],
        key: jax.Array,
    ) -> Tuple[DISCOState, DISCOData]:
        """One MPPI update of the plan from the current environment state
        (parity: ``disco.py:331-377`` with a single policy)."""
        key_eps, key_par = jax.random.split(key)
        cov = self._pol_cov()
        chol = jnp.linalg.cholesky(cov)
        eps = (
            jax.random.normal(key_eps, (self.n_actions, self.hz_len, self.dim_a))
            @ chol.T
        )
        actions = ctrl.a_seq[None] + eps  # [n, H, a]

        if self.utf is not None and params_dist is not None:
            states, costs = self._sigma_rollout(state, actions, params_dist)
        else:
            states, costs = self._mc_rollout(state, actions, params_dist, key_par)

        # control-cost term: λ Σ_t u_tᵀ Σ⁻¹ ε_t with the IT-MPC paper's sign
        # (deliberate deviation: the reference, disco.py:323-327, contracts
        # with -eps through its bit-rotted multi-policy a_mat path, which
        # would REWARD large perturbations whenever a_reg ≠ 0)
        a_pre = jnp.linalg.inv(cov)
        a_reg = self.temperature * (1.0 - self.ctrl_penalty)
        ctrl_costs = a_reg * jnp.einsum("nha,ha->n", eps, ctrl.a_seq @ a_pre)
        costs = costs + ctrl_costs

        # exponentiated-utility softmax weighting (disco.py:362-376)
        beta = jnp.min(costs)
        omega = jax.nn.softmax(-(costs - beta) / self.temperature)
        new_plan = ctrl.a_seq + jnp.einsum("n,nha->ha", omega, eps)
        data = DISCOData(costs=costs, states=states, actions=actions, omega=omega)
        return DISCOState(a_seq=new_plan), data

    def _mc_rollout(self, state, actions, params_dist, key):
        if self.n_params > 0 and params_dist is not None:
            mat = du.sample(params_dist, key, (self.n_params,))
            mat = jnp.atleast_2d(mat.reshape(self.n_params, -1))
            if self.params_log_space:
                mat = jnp.exp(mat)
            params = self._params_dict(mat, extra_batch_dims=1)
            acts = jnp.broadcast_to(
                actions[None], (self.n_params,) + actions.shape
            )  # [P, n, H, a]
            states = rollout(self.model, state, acts, params)  # [P, n, H+1, s]
            inst = self._inst(states[..., :-1, :], acts).sum(-1)
            term = self._term(states[..., -1, :])
            costs = (inst + term).mean(0)  # average over params
        else:
            states = rollout(self.model, state, actions)
            inst = self._inst(states[..., :-1, :], actions).sum(-1)
            term = self._term(states[..., -1, :])
            costs = inst + term
        return states, costs

    def _sigma_rollout(self, state, actions, params_dist):
        """Unscented-transform rollouts: propagate each action sequence through
        the 2p+1 sigma points of the parameter distribution and weight costs
        by the UTF location weights (``disco.py:195-276,296-307``)."""
        mean, cov = du.moments(params_dist)
        sigmas = self.utf.compute_sigma_points(mean, cov)  # [p, pts]
        mat = sigmas.T  # [pts, p]
        params = self._params_dict(mat, extra_batch_dims=1)
        acts = jnp.broadcast_to(actions[None], (self.utf.pts,) + actions.shape)
        states = rollout(self.model, state, acts, params)  # [pts, n, H+1, s]
        inst = self._inst(states[..., :-1, :], acts).sum(-1)  # [pts, n]
        term = self._term(states[..., -1, :])
        w = self.utf.loc_weights
        costs = jnp.einsum("p,pn->n", w, inst + term)
        return states, costs

    # -- act ---------------------------------------------------------------
    def act(
        self,
        ctrl: DISCOState,
        steps: int = 1,
        strategy: str = "average",
        data: Optional[DISCOData] = None,
        ext_actions: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, DISCOState]:
        """Clip the plan, emit the next ``steps`` actions, roll and zero-fill.

        Strategies (parity: ``DISCO.step``, ``disco.py:379-400``):
          * ``average`` — the softmax-blended plan from :meth:`forward`
            (the reference's ``a_mat.T @ a_mix`` collapsed to one policy);
          * ``argmax`` — the best single sampled action sequence of the last
            solve (requires ``data``; the reference's ``a_mat[argmax]``);
          * ``external`` — act from ``ext_actions`` verbatim.
        """
        if strategy == "average":
            a_seq = ctrl.a_seq
        elif strategy == "argmax":
            assert data is not None, "argmax strategy needs the solve's data"
            a_seq = data.actions[jnp.argmax(data.omega)]
        elif strategy == "external":
            assert ext_actions is not None
            a_seq = ext_actions
        else:
            raise ValueError(f"Invalid strategy: {strategy}")
        space = self.model.action_space
        a_seq = space.clip(a_seq)
        next_actions = a_seq[:steps]
        rolled = jnp.roll(a_seq, -steps, axis=0).at[-steps:].set(0.0)
        return next_actions, DISCOState(a_seq=rolled)
