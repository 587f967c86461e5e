"""DuSt — Dual Stein variational MPC, TPU-native.

Counterpart of reference ``src/controllers/dust.py:16-536`` (Lambert et al.
"Stein variational MPC" + the SigSVGD trajectory-kernel extension): each Stein
particle is a control *policy* (an action-mean sequence over the horizon).
Every control step runs a few SVGD iterations on the policies where

  * the posterior is ``p(θ) ∝ exp(-cost(θ)/α) · GMM-prior(θ)``,
  * the likelihood gradient comes either from reparameterized action samples
    (score-function estimator with softmax weights, ``dust.py:353-362``) or
    from autodiff through the rollout (``dust.py:363-365``),
  * the kernel acts on policies directly (RBF), or on the *rollout
    trajectories* (trajectory kernel / PDE signature kernel) with gradients
    pulled back through the rollout (``trajectory_svgd.py:31-78``).

Functional design: static config dataclass + :class:`DuStState` pytree;
``forward`` is one jittable function whose ``opt_steps`` SVGD iterations are a
``lax.scan``; rollouts batch ``params × action-samples × policies`` through a
single scanned model step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..inference.svgd import SVGD, ScoreResult, SVGDState
from ..kernels import GaussianKernel, SignatureKernel
from ..models.base import DynamicsModel
from ..models.rollout import rollout
from ..utils import distributions as du
from ..utils.math import grad_gmm_log_p, smoothed_box_log_prob

CostFn = Callable[..., jax.Array]


class DuStState(NamedTuple):
    pol_mean: jax.Array  # [n_pol, H, dim_a] policy particles
    prior_weights: jax.Array  # [n_pol] GMM prior weights
    svgd_state: SVGDState


class DuStData(NamedTuple):
    costs: jax.Array  # [opt_steps, (S,) n_pol] costs per SVGD iteration
    loss: jax.Array  # [opt_steps, ...]
    trace: jax.Array  # [opt_steps + 1, n_pol, H, dim_a]
    pol_weights: jax.Array  # [n_pol] final softmax policy weights
    trajectories: jax.Array  # last-iteration rollouts


@dataclasses.dataclass(frozen=True)
class DuSt:
    model: DynamicsModel
    hz_len: int
    n_pol: int  # random policies (primitives add to this)
    n_action_samples: int = 0  # 0 → autodiff likelihood gradient
    n_params_samples: int = 0  # 0 → default dynamics parameters
    pol_cov: Tuple[Tuple[float, ...], ...] = ()  # [a, a]; empty = identity
    temperature: float = 1.0
    params_log_space: bool = False
    pol_hyper_prior: bool = True
    weighted_prior: bool = False
    roll_strategy: str = "repeat"  # repeat | resample | mean
    kernel_mode: str = "policy"  # policy | trajectory | signature
    kernel: Any = dataclasses.field(default_factory=GaussianKernel)
    sig_kernel: SignatureKernel = dataclasses.field(
        default_factory=lambda: SignatureKernel(dyadic_order=2)
    )
    stein_sampler: str = "SVGD"  # SVGD | ScaledSVGD | MatrixSVGD
    optimizer: Optional[optax.GradientTransformation] = None
    lr: float = 0.1
    # shift optimizer state with the receding horizon (adam moments / L-BFGS
    # curvature memories roll along H, last step zero-filled) — the
    # reference's LBFGS state roll, dust.py:388-412
    roll_opt_state: bool = False
    fused_velocity: bool = False  # Pallas fused SVGD update (policy RBF mode)
    n_prim: int = 0  # leading policies that are frozen action primitives
    init_uniform_range: float = 10.0
    inst_cost_fn: Optional[CostFn] = None
    term_cost_fn: Optional[CostFn] = None

    # ------------------------------------------------------------------
    @property
    def dim_a(self) -> int:
        return self.model.dim_a

    @property
    def n_total(self) -> int:
        return self.n_pol + self.n_prim

    def _pol_cov(self) -> jax.Array:
        if self.pol_cov:
            return jnp.asarray(self.pol_cov, jnp.float32)
        return jnp.eye(self.dim_a, dtype=jnp.float32)

    def _prior_var(self) -> jax.Array:
        """Per-dimension GMM-prior variance: diag(pol_cov) tiled over the
        horizon (the reference's ``to_gmm`` builds time-independent MVN
        components with ``pol_cov``, ``dust.py:122-123``)."""
        return jnp.tile(jnp.diag(self._pol_cov()), self.hz_len)

    def _sampler(self) -> SVGD:
        mask = jnp.ones((self.n_total, self.hz_len, self.dim_a), jnp.float32)
        if self.n_prim > 0:
            mask = mask.at[: self.n_prim].set(0.0)
        log_prior = None
        space = self.model.action_space
        if self.pol_hyper_prior and space.bounded:
            low, high = space.low, space.high

            def log_prior(pol):  # noqa: F811
                return smoothed_box_log_prob(pol, low, high, 0.1).sum(-1)

        common = dict(
            optimizer=self.optimizer,
            lr=self.lr,
            log_prior=log_prior,
            gradient_mask=mask if self.n_prim > 0 else None,
            fused_velocity=self.fused_velocity,
        )
        if self.stein_sampler == "SVGD":
            return SVGD(kernel=self.kernel, **common)
        from ..inference.svgd import ScaledSVGD

        if self.stein_sampler == "ScaledSVGD":
            return ScaledSVGD(kernel=self.kernel, precondition=False, **common)
        if self.stein_sampler == "MatrixSVGD":
            return ScaledSVGD(kernel=self.kernel, precondition=True, **common)
        raise ValueError(f"Invalid stein_sampler: {self.stein_sampler}")

    # ------------------------------------------------------------------
    def init(
        self,
        key: jax.Array,
        pol_mean: Optional[jax.Array] = None,
        action_primitives: Optional[jax.Array] = None,
    ) -> DuStState:
        """Initialize policies uniformly in the (clipped) action range
        (``dust.py:176-213``) and prepend frozen primitives."""
        space = self.model.action_space
        if pol_mean is None:
            low = jnp.maximum(jnp.max(space.low), -self.init_uniform_range)
            high = jnp.minimum(jnp.min(space.high), self.init_uniform_range)
            pol_mean = jax.random.uniform(
                key, (self.n_pol, self.hz_len, self.dim_a), minval=low, maxval=high
            )
        if action_primitives is not None:
            assert action_primitives.shape[0] == self.n_prim
            pol_mean = jnp.concatenate([action_primitives, pol_mean], axis=0)
        elif self.n_prim:
            raise ValueError("n_prim > 0 but no action_primitives given")
        sampler = self._sampler()
        return DuStState(
            pol_mean=pol_mean,
            prior_weights=jnp.ones((self.n_total,), jnp.float32),
            svgd_state=sampler.init(pol_mean),
        )

    # ------------------------------------------------------------------
    def _params_dict(self, mat: jax.Array, extra_batch_dims: int):
        cols = self.model.params_to_dict(mat)
        shape = (-1,) + (1,) * (extra_batch_dims + 1)
        return {k: v.reshape(shape) for k, v in cols.items()}

    def _rollout_costs(self, state, actions, params_mat):
        """Roll ``[.., n_pol, H, a]`` action batches; returns (costs, states).

        ``actions`` may carry a leading sample axis [S, n_pol, H, a]; with
        ``P = n_params_samples`` a params axis is prepended (parity with the
        reference's repeat_interleave batching, ``dust.py:272-306``).
        """
        # branch on the actual sample matrix: n_params_samples > 0 with
        # params_dist=None degrades gracefully to default model parameters
        # (the reference/DISCO behavior) instead of crashing
        if params_mat is not None:
            params = self._params_dict(params_mat, extra_batch_dims=actions.ndim - 2)
            acts = jnp.broadcast_to(
                actions[None], (self.n_params_samples,) + actions.shape
            )
            states = rollout(self.model, state, acts, params)
        else:
            states = rollout(self.model, state, actions)

        inst = (
            self.inst_cost_fn(states[..., :-1, :], actions)
            if self.inst_cost_fn is not None
            else jnp.zeros(states.shape[:-2] + (self.hz_len,))
        ).sum(-1)
        term = (
            self.term_cost_fn(states[..., -1, :])
            if self.term_cost_fn is not None
            else jnp.zeros(states.shape[:-2])
        )
        costs = inst + term
        if params_mat is not None:
            costs = costs.mean(0)  # average over params axis (dust.py:246-247)
            states = states[0]  # one params slice is enough for the kernel/logs
        return costs, states

    def _log_lik(self, costs: jax.Array) -> jax.Array:
        """Exponentiated utility with min-subtraction (likelihoods.py:76-92).

        The min is detached: it is a numerical-stability shift, and letting
        its gradient flow would add a spurious ``(N-1)·∇c`` *ascent* term to
        the current best policy under the autodiff likelihood path.
        """
        return -(costs - lax.stop_gradient(jnp.min(costs))) / self.temperature

    # ------------------------------------------------------------------
    def _score(self, pol_mean, state, prior, params_mat, key):
        """Score estimator: grad of log-posterior over policies + kernel terms
        on trajectories (the ``score_estimator`` closure, ``dust.py:484-517``)."""
        cov = self._pol_cov()
        s_shape = (
            (self.n_action_samples,) if self.n_action_samples > 0 else ()
        )

        # -- sample actions (reparameterized, dust.py:308-323) -----------
        if s_shape:
            chol = jnp.linalg.cholesky(cov)
            eps = jax.random.normal(
                key, s_shape + pol_mean.shape, pol_mean.dtype
            )
            actions = pol_mean[None] + eps @ chol.T
        else:
            actions = pol_mean

        # -- prior gradient (analytic GMM, dust.py:347-349) --------------
        grad_pri = grad_gmm_log_p(
            pol_mean.reshape(self.n_total, -1),
            prior.means,
            prior.var,
            prior.weights,
        ).reshape(pol_mean.shape)

        # -- likelihood gradient (dust.py:351-365) -----------------------
        if s_shape:
            costs, trajs = self._rollout_costs(state, actions, params_mat)
            log_lik = self._log_lik(costs)
            pre = jnp.linalg.inv(cov)
            grad_log_pol = (actions - pol_mean[None]) @ pre  # [S, N, H, a]
            w = jax.nn.softmax(log_lik, axis=0)[..., None, None]
            grad_lik = jnp.sum(w * grad_log_pol, axis=0)
            loss = -jnp.sum(log_lik, axis=0)
        else:

            def sum_log_lik(pm):
                c, tr = self._rollout_costs(state, pm, params_mat)
                return jnp.sum(self._log_lik(c)), (c, tr)

            (_, (costs, trajs)), grad_lik = jax.value_and_grad(
                sum_log_lik, has_aux=True
            )(pol_mean)
            loss = -self._log_lik(costs)

        grad_log_p = grad_pri + grad_lik

        # -- kernel terms on trajectories (trajectory_svgd.py:31-78) -----
        # the fixed sampled offsets let kernel gradients flow to the policy
        # means through the same actions the costs used
        offsets = (
            lax.stop_gradient(actions - pol_mean[None]) if s_shape else None
        )
        k_xx, grad_k = self._kernel_terms(pol_mean, state, params_mat, trajs, offsets)
        return ScoreResult(
            grad_log_p=grad_log_p,
            k_xx=k_xx,
            grad_k=grad_k,
            loss=loss,
            aux={"costs": costs},
        ), trajs

    def _tau(self, trajs: jax.Array) -> jax.Array:
        """Trajectory projection entering the kernel: XY positions from t+1 on,
        averaged over the action-sample axis (``trajectory_svgd.py:34,50,57``)."""
        tau = trajs[..., 1:, :2]
        if self.n_action_samples > 0:
            tau = tau.mean(0)
        return tau

    def _kernel_terms(self, pol_mean, state, params_mat, trajs, offsets):
        if self.kernel_mode == "policy":
            return None, None  # sampler computes its analytic kernel on policies

        def tau_of(pm):
            acts = pm if offsets is None else pm[None] + offsets
            _, tr = self._rollout_costs(state, acts, params_mat)
            return self._tau(tr)

        ref = lax.stop_gradient(self._tau(trajs))
        if self.kernel_mode == "signature":
            # one rollout + ONE PDE forward shared between K and its
            # pull-back gradient: gram_and_grad fuses value+vjp per pair
            # chunk with the a-priori Σ-cotangent (upper-triangle Gram =
            # half the PDE work; its gradient flows through both kernel
            # arguments and gram_and_grad folds in the ×0.5 that recovers
            # the detached-second-argument repulsion). The trajectory
            # pull-back τ → policies is chained via the rollout's vjp.
            tau, vjp_tau = jax.vjp(tau_of, pol_mean)
            k_xx, dtau = self.sig_kernel.gram_and_grad(tau)
            (grad_k,) = vjp_tau(dtau)
            return k_xx, grad_k
        if self.kernel_mode == "trajectory":
            # per-dimension RBF on trajectory projections, grads via AD
            # (trajectory_svgd.py:32-47)
            def mean_gram(pm):
                from ..utils.math import bw_median_diff, pw_dist_sq

                t = tau_of(pm)
                k = 0.0
                for i in range(t.shape[-1]):
                    h = None
                    if self.kernel.bandwidth_fn is None:
                        # median bandwidth with the row-major gradient
                        # tie-break (bw_median_diff): the symmetric distance
                        # matrix always duplicates its median, and pinning
                        # which twin carries the gradient makes this path
                        # reproducible by the sharded solver
                        h = bw_median_diff(
                            pw_dist_sq(t[..., i], ref[..., i]),
                            self.kernel.bw_scale,
                        )
                    k = k + self.kernel(
                        t[..., i], ref[..., i], h=h, compute_grad=False
                    )
                k = k / t.shape[-1]
                return jnp.sum(k), k

            (_, k_xx), grad_k = jax.value_and_grad(mean_gram, has_aux=True)(
                pol_mean
            )
            return k_xx, grad_k
        raise ValueError(f"Invalid kernel_mode: {self.kernel_mode}")

    # ------------------------------------------------------------------
    def forward(
        self,
        state: jax.Array,
        ctrl: DuStState,
        params_dist: Optional[du.Distribution],
        key: jax.Array,
        opt_steps: int = 5,
    ) -> Tuple[jax.Array, DuStState, DuStData]:
        """One MPC solve: ``opt_steps`` SVGD iterations on the policies, pick
        the best policy, then roll/update housekeeping (``dust.py:446-536``)."""
        sampler = self._sampler()
        prior = du.ParticleGMM(
            means=ctrl.pol_mean.reshape(self.n_total, -1),
            var=self._prior_var(),
            weights=ctrl.prior_weights,
        )

        key, key_par = jax.random.split(key)
        if self.n_params_samples > 0 and params_dist is not None:
            params_mat = du.sample(params_dist, key_par, (self.n_params_samples,))
            params_mat = jnp.atleast_2d(
                params_mat.reshape(self.n_params_samples, -1)
            )
            if self.params_log_space:
                params_mat = jnp.exp(params_mat)
        else:
            params_mat = None

        # line-search optimizers (inference.svgd.lbfgs) probe a scalar
        # objective along the L-BFGS direction; the rollout cost total plays
        # the reference's closure-loss role (LBFGS.py Armijo/Wolfe search)
        value_fn = None
        if isinstance(sampler.optimizer, optax.GradientTransformationExtraArgs):

            def value_fn(pm):  # noqa: F811
                c, _ = self._rollout_costs(state, pm, params_mat)
                return jnp.sum(c) / self.temperature

        def body(carry, step_key):
            pol, svgd_state = carry
            score, trajs = self._score(pol, state, prior, params_mat, step_key)
            new_pol, new_state = sampler.step_update(
                pol, svgd_state, score, value_fn=value_fn
            )
            return (new_pol, new_state), (score.aux["costs"], score.loss, new_pol, trajs)

        # opt_steps step keys + a distinct roll key (re-splitting the same key
        # would make the resample-roll draws collide with a step's draws)
        all_keys = jax.random.split(key, opt_steps + 1)
        keys, key_roll = all_keys[:opt_steps], all_keys[opt_steps]
        (pol_final, svgd_state), (costs_seq, loss_seq, pol_trace, traj_seq) = lax.scan(
            body, (ctrl.pol_mean, ctrl.svgd_state), keys
        )
        trace = jnp.concatenate([ctrl.pol_mean[None], pol_trace], axis=0)

        # -- policy weights from the last iteration's costs (dust.py:520-526)
        last_costs = costs_seq[-1]
        log_lik = self._log_lik(last_costs)
        if self.n_action_samples > 0:
            pol_weights = jax.nn.softmax(log_lik.mean(0))
        else:
            pol_weights = jax.nn.softmax(log_lik)

        i_star = jnp.argmax(pol_weights)
        a_seq = pol_final[i_star]

        # -- housekeeping: roll, prior update (dust.py:428-444,414-426) ---
        rolled = self._roll(pol_final, prior, key_roll)
        if self.roll_opt_state:
            from ..inference.svgd import roll_opt_state as _roll_state

            svgd_state = SVGDState(
                opt_state=_roll_state(
                    svgd_state.opt_state, (self.n_total, self.hz_len, self.dim_a)
                ),
                step=svgd_state.step,
            )
        new_weights = (
            pol_weights if self.weighted_prior else jnp.ones_like(pol_weights)
        )
        new_ctrl = DuStState(
            pol_mean=rolled,
            prior_weights=new_weights,
            svgd_state=svgd_state,
        )
        data = DuStData(
            costs=costs_seq,
            loss=loss_seq,
            trace=trace,
            pol_weights=pol_weights,
            trajectories=traj_seq[-1],
        )
        return a_seq, new_ctrl, data

    def _roll(self, pol_mean, prior, key):
        rolled = jnp.roll(pol_mean, -1, axis=-2)
        if self.roll_strategy == "repeat":
            last = rolled[..., -2, :]
        elif self.roll_strategy == "mean":
            last = pol_mean.mean(axis=-2)
        elif self.roll_strategy == "resample":
            samp = du.sample(prior, key, (self.n_total,))
            last = samp.reshape(self.n_total, self.hz_len, self.dim_a)[..., -1, :]
        else:
            raise ValueError(f"Invalid roll strategy: {self.roll_strategy}")
        return rolled.at[..., -1, :].set(last)
