"""DISCO — information-theoretic MPC (MPPI variant), TPU-native.

Counterpart of reference ``src/controllers/disco.py:13-400`` (Williams et al.
2017 IT-MPC): sample perturbed action sequences per policy, roll them through
the model (optionally over sampled dynamics parameters or unscented sigma
points), weight by exponentiated utility, and blend the perturbations into
each policy's plan.

Multi-policy ensemble (reference ``disco.py:318-400``): the controller keeps
``n_pol`` independent plans ``a_mat [n_pol, H, dim_a]``. Each solve samples
``n_actions`` perturbations PER policy, softmax-weights them within each
policy (per-policy log-normalizer ``eta_p``), updates every plan, and forms
the policy mixture weights ``a_mix = softmax(eta)`` from the normalizers.
``act`` then commits ``a_mat[argmax a_mix]`` (argmax strategy) or the
``a_mix``-weighted average, and rolls both the plan and the ensemble.
Deliberate deviations from the reference's partially bit-rotted ensemble
code, kept because the upstream statements cannot run as written (``n_pol``
and ``a_mat`` are referenced but never initialised in ``__init__``):

  * the control-cost trace term contracts with ``+eps`` (IT-MPC paper sign);
    the reference's ``-eps`` (``disco.py:325``) would reward large
    perturbations whenever ``a_reg != 0``;
  * the MC rollout perturbs ``a_mat`` (per-policy plans) like the sigma-point
    path does (``disco.py:216``), not the committed ``a_seq``
    (``disco.py:155``) — the two reference paths disagree, and only the
    ``a_mat`` form makes the ensemble update coherent.

Functional design: the controller is static config; the ensemble lives in
:class:`DISCOState`; ``forward`` + ``act`` are pure jittable functions whose
horizon rollout is a single ``lax.scan`` (the reference's per-step Python loop
+ ``torch.cat``, ``disco.py:181-188``, becomes one fused XLA program) and the
per-policy update is one einsum over the ``[n_actions, n_pol]`` weight matrix
instead of the reference's ``n_pol × n_pol`` tensordot + diagonal
(``disco.py:370-375``).
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
    a_mat: jax.Array  # [n_pol, H, dim_a] per-policy plans
    a_mix: jax.Array  # [n_pol] policy weights (softmax of log-normalizers)

    @property
    def a_seq(self) -> jax.Array:
        """The committed mixture plan ``Σ_p a_mix[p]·a_mat[p]`` (reference
        ``step(strategy="average")``, ``disco.py:386``); equals the single
        plan when ``n_pol == 1``."""
        return jnp.einsum("p,pha->ha", self.a_mix, self.a_mat)


class DISCOData(NamedTuple):
    costs: jax.Array  # [n_actions, n_pol]
    states: jax.Array  # [..., H+1, dim_s] sampled rollouts
    actions: jax.Array  # [n_actions, n_pol, H, dim_a]
    omega: jax.Array  # [n_actions, n_pol] per-policy softmax weights


@dataclasses.dataclass(frozen=True)
class DISCO:
    model: DynamicsModel
    hz_len: int
    n_actions: int  # sampled action sequences per policy per solve
    n_pol: int = 1  # policies in the ensemble
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
        """Initial ensemble state. ``init_policy`` may be ``[H, dim_a]``
        (shared across the ensemble) or ``[n_pol, H, dim_a]``."""
        shape = (self.n_pol, self.hz_len, self.dim_a)
        if init_policy is None:
            a = jnp.zeros(shape, jnp.float32)
        else:
            ip = jnp.asarray(init_policy, jnp.float32)
            a = jnp.broadcast_to(ip if ip.ndim == 3 else ip[None], shape)
        mix = jnp.full((self.n_pol,), 1.0 / self.n_pol, jnp.float32)
        return DISCOState(a_mat=a, a_mix=mix)

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
        """One MPPI update of every policy in the ensemble from the current
        environment state (parity: ``disco.py:331-377``)."""
        key_eps, key_par = jax.random.split(key)
        cov = self._pol_cov()
        chol = jnp.linalg.cholesky(cov)
        eps = (
            jax.random.normal(
                key_eps, (self.n_actions, self.n_pol, self.hz_len, self.dim_a)
            )
            @ chol.T
        )
        actions = ctrl.a_mat[None] + eps  # [n, p, H, a]

        if self.utf is not None and params_dist is not None:
            states, costs = self._sigma_rollout(state, actions, params_dist)
        else:
            states, costs = self._mc_rollout(state, actions, params_dist, key_par)

        # control-cost term: λ Σ_t u_tᵀ Σ⁻¹ ε_t with the IT-MPC paper's sign
        # (deliberate deviation: the reference, disco.py:323-327, contracts
        # with -eps, which would REWARD large perturbations when a_reg ≠ 0)
        a_pre = jnp.linalg.inv(cov)
        a_reg = self.temperature * (1.0 - self.ctrl_penalty)
        ctrl_costs = a_reg * jnp.einsum(
            "npha,pha->np", eps, ctrl.a_mat @ a_pre
        )
        costs = costs + ctrl_costs  # [n, p]

        # per-policy exponentiated-utility weighting with a shared baseline
        # (disco.py:362-376): eta_p is each policy's log-normalizer; the
        # ensemble weights a_mix come from the eta themselves
        beta = jnp.min(costs)
        log_costs = -(costs - beta) / self.temperature   # [n, p]
        eta = jax.nn.logsumexp(log_costs, axis=0)        # [p]
        omega = jnp.exp(log_costs - eta[None])           # [n, p]
        a_mat = ctrl.a_mat + jnp.einsum("np,npha->pha", omega, eps)
        a_mix = jax.nn.softmax(eta)
        data = DISCOData(costs=costs, states=states, actions=actions, omega=omega)
        return DISCOState(a_mat=a_mat, a_mix=a_mix), data

    def _mc_rollout(self, state, actions, params_dist, key):
        """MC rollouts for ``[..., H, dim_a]`` action batches (any leading
        dims); costs average over the parameter samples."""
        bdims = actions.ndim - 2
        if self.n_params > 0 and params_dist is not None:
            mat = du.sample(params_dist, key, (self.n_params,))
            mat = jnp.atleast_2d(mat.reshape(self.n_params, -1))
            if self.params_log_space:
                mat = jnp.exp(mat)
            params = self._params_dict(mat, extra_batch_dims=bdims)
            acts = jnp.broadcast_to(
                actions[None], (self.n_params,) + actions.shape
            )  # [P, ..., H, a]
            states = rollout(self.model, state, acts, params)
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
        params = self._params_dict(mat, extra_batch_dims=actions.ndim - 2)
        acts = jnp.broadcast_to(actions[None], (self.utf.pts,) + actions.shape)
        states = rollout(self.model, state, acts, params)
        inst = self._inst(states[..., :-1, :], acts).sum(-1)  # [pts, ...]
        term = self._term(states[..., -1, :])
        costs = jnp.tensordot(self.utf.loc_weights, inst + term, axes=1)
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
        """Commit a plan, emit the next ``steps`` actions, roll the ensemble.

        Strategies (parity: ``DISCO.step``, ``disco.py:379-400``):
          * ``average`` — the ``a_mix``-weighted mixture of the per-policy
            plans (``(a_mat.T @ a_mix).T``);
          * ``argmax`` — the plan of the highest-weight policy
            (``a_mat[a_mix.argmax()]``);
          * ``best_sample`` — the best single sampled action sequence of the
            last solve (requires ``data``; convenience extra, not in the
            reference);
          * ``external`` — act from ``ext_actions`` verbatim.

        The per-policy plans roll with the horizon (``a_mat.roll`` +
        zero-fill, ``disco.py:398-399``) so the ensemble persists across MPC
        steps.
        """
        if strategy == "average":
            a_seq = ctrl.a_seq
        elif strategy == "argmax":
            a_seq = jnp.take(ctrl.a_mat, jnp.argmax(ctrl.a_mix), axis=0)
        elif strategy == "best_sample":
            assert data is not None, "best_sample strategy needs the solve's data"
            flat = data.omega.reshape(-1)
            acts = data.actions.reshape(flat.shape[0], self.hz_len, self.dim_a)
            a_seq = jnp.take(acts, jnp.argmax(flat), axis=0)
        elif strategy == "external":
            assert ext_actions is not None
            a_seq = ext_actions
        else:
            raise ValueError(f"Invalid strategy: {strategy}")
        space = self.model.action_space
        a_seq = space.clip(a_seq)
        next_actions = a_seq[:steps]
        rolled = jnp.roll(ctrl.a_mat, -steps, axis=1).at[:, -steps:].set(0.0)
        return next_actions, DISCOState(a_mat=rolled, a_mix=ctrl.a_mix)
