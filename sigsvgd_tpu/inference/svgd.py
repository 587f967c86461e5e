"""Stein variational gradient descent engines (SVGD / ScaledSVGD / MatrixSVGD).

Functional TPU-native counterpart of the reference's ``src/inference/svgd.py``
and ``src/inference/trajectory_svgd.py``: the sampler is a frozen config
object; all state (particles + optimizer state) lives in explicit pytrees; the
optimization loop is a single ``lax.scan`` so the whole ``n_steps``-step solve
compiles to one XLA program (the reference re-launches kernels per step from
Python).

Update rule (matching ``svgd.py:82-83,115``): with score ``s_i = ∇ log p(x_i)``
and aggregated kernel gradient ``g_i = Σ_j ∂k(x_i, x_j)/∂x_i``,

    φ_i = (Σ_j k_ij s_j − g_i) / n          (Stein velocity, ascent direction)
    x_i ← optimizer_update(x_i, −φ_i)        (descent on −φ)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..kernels import GaussianKernel


class ScoreResult(NamedTuple):
    """Output protocol of a score estimator (reference ``svgd.py:144-149``:
    estimators may override the kernel terms via ``k_xx``/``grad_k``).

    Attributes:
      grad_log_p: ``[n, ...]`` score per particle (particle-shaped).
      k_xx: optional ``[n, n]`` kernel Gram override.
      grad_k: optional ``[n, ...]`` aggregated kernel-gradient override.
      loss: optional per-particle loss (negative log-lik) for logging.
      aux: arbitrary pytree of per-step diagnostics (must have a fixed
        structure across steps for ``lax.scan``).
    """

    grad_log_p: jax.Array
    k_xx: Optional[jax.Array] = None
    grad_k: Optional[jax.Array] = None
    loss: Optional[jax.Array] = None
    aux: Any = None


ScoreFn = Callable[[jax.Array, jax.Array], ScoreResult]  # (particles, key) -> result


class SVGDState(NamedTuple):
    opt_state: Any
    step: jax.Array


class RunData(NamedTuple):
    trace: jax.Array  # [n_steps + 1, n, ...] particle trajectory
    loss: jax.Array  # [n_steps, ...] per-step losses
    aux: Any  # stacked score-fn aux


def _flat(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


# compiled whole-run solves, keyed by (sampler, score, value_fn, n_steps)
# identities — see SVGD.run
_run_jit_cache: dict = {}


@dataclasses.dataclass(frozen=True)
class SVGD:
    """First-order SVGD sampler.

    Attributes:
      kernel: analytic-gradient kernel ``(X, Y) -> (K, dK)`` (default RBF with
        median bandwidth).
      optimizer: an optax transform; if None, a raw ``lr`` update is used
        (optionally with the reference's hand-rolled Adagrad,
        ``svgd.py:110-115``).
      lr: step size for the raw update path.
      adagrad: enable the hand-rolled Adagrad accumulator in raw mode.
      log_prior: optional ``particles -> [n]`` log-prior whose gradient is
        added to the score (``svgd.py:75-79``).
      repulsion_schedule: optional ``step -> scale`` multiplier on the
        repulsion term (the reference applies it inside its score estimators,
        ``score.py:44,58,72``).
      gradient_mask: optional particle-shaped {0,1} mask multiplied into the
        velocity (freezes action primitives, ``trajectory_svgd.py:80-84``).
    """

    kernel: Any = dataclasses.field(default_factory=GaussianKernel)
    optimizer: Optional[optax.GradientTransformation] = None
    lr: float = 1e-2
    adagrad: bool = False
    log_prior: Optional[Callable[[jax.Array], jax.Array]] = None
    repulsion_schedule: Optional[Callable[[jax.Array], jax.Array]] = None
    gradient_mask: Optional[jax.Array] = None
    # fuse Gram + K@s + ∇K into one Pallas kernel (plain GaussianKernel only;
    # ~2x at ≥4k particles on TPU, XLA fallback elsewhere)
    fused_velocity: bool = False

    # -- state ------------------------------------------------------------
    def init(self, particles: jax.Array) -> SVGDState:
        if self.optimizer is not None:
            opt_state = self.optimizer.init(particles)
        elif self.adagrad:
            opt_state = jnp.zeros_like(particles)
        else:
            opt_state = ()
        return SVGDState(opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    # -- core -------------------------------------------------------------
    def _kernel_terms(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        k_xx, grad_k = self.kernel(_flat(x), _flat(x))
        return k_xx, grad_k

    def velocity(
        self, x: jax.Array, score: ScoreResult, step: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Stein velocity φ (particle-shaped) and the logged loss."""
        n = x.shape[0]
        s = _flat(score.grad_log_p)
        if self.log_prior is not None:
            prior_grad = jax.grad(lambda xx: jnp.sum(self.log_prior(xx)))(x)
            s = s + _flat(prior_grad)

        use_fused = (
            self.fused_velocity
            and score.k_xx is None
            and self.repulsion_schedule is None
            and type(self.kernel) is GaussianKernel
        )
        if use_fused:
            from ..kernels.pallas_svgd import fused_rbf_velocity
            from ..utils.math import bw_median, pw_dist_sq

            xf = _flat(x)
            if self.kernel.bandwidth_fn is not None:
                h = self.kernel.bandwidth_fn(pw_dist_sq(xf, xf))
            else:
                h = bw_median(pw_dist_sq(xf, xf), self.kernel.bw_scale)
            phi = fused_rbf_velocity(xf, s, h).reshape(x.shape)
        else:
            if score.k_xx is not None and score.grad_k is not None:
                k_xx, grad_k = score.k_xx, _flat(score.grad_k)
            else:
                k_xx, grad_k = self._kernel_terms(x)
            if self.repulsion_schedule is not None:
                grad_k = grad_k * self.repulsion_schedule(step)
            phi = ((k_xx @ s - grad_k) / n).reshape(x.shape)
        if self.gradient_mask is not None:
            phi = phi * self.gradient_mask
        loss = score.loss if score.loss is not None else jnp.linalg.norm(s)
        return phi, loss

    def apply_update(self, x: jax.Array, grad: jax.Array, opt_state,
                     value=None, value_fn=None):
        """Optimizer application shared by every runner (optax / hand-rolled
        Adagrad / raw lr). ``grad`` is the descent direction (``-φ``).

        ``value``/``value_fn`` feed extra-args optimizers (L-BFGS with the
        zoom strong-Wolfe line search, :func:`lbfgs`): the line search probes
        ``value_fn`` along the L-BFGS direction, playing the role of the
        reference's vendored Armijo/Wolfe closure search (``LBFGS.py:177-
        1104``). As there, the Stein velocity is treated as the objective's
        gradient even though it is not an exact gradient field."""
        if self.optimizer is not None:
            if value_fn is not None and isinstance(
                self.optimizer, optax.GradientTransformationExtraArgs
            ):
                if value is None:
                    value = value_fn(x)  # Wolfe conditions need f(x) exactly
                updates, opt_state = self.optimizer.update(
                    grad, opt_state, x, value=value, grad=grad, value_fn=value_fn
                )
            else:
                updates, opt_state = self.optimizer.update(grad, opt_state, x)
            return optax.apply_updates(x, updates), opt_state
        if self.adagrad:
            inertia = opt_state + grad**2
            return x - self.lr * grad / jnp.sqrt(inertia + 1e-12), inertia
        return x - self.lr * grad, opt_state

    def step_update(
        self, x: jax.Array, state: SVGDState, score: ScoreResult,
        value_fn=None,
    ) -> Tuple[jax.Array, SVGDState]:
        """One SVGD step given a pre-computed score. ``value_fn`` (scalar
        objective of the particles) enables line-search optimizers."""
        phi, _loss = self.velocity(x, score, state.step)
        x, opt_state = self.apply_update(
            x, -phi, state.opt_state, value_fn=value_fn
        )
        return x, SVGDState(opt_state=opt_state, step=state.step + 1)

    # -- driver -----------------------------------------------------------
    def run(
        self,
        particles: jax.Array,
        score_fn: ScoreFn,
        n_steps: int,
        key: Optional[jax.Array] = None,
        state: Optional[SVGDState] = None,
        value_fn=None,
    ) -> Tuple[jax.Array, SVGDState, RunData]:
        """Run ``n_steps`` of SVGD as one ``lax.scan``.

        ``state`` threads optimizer state across calls — the receding-horizon
        warm start the reference gets from ``opt_state`` round-tripping
        (``svgd.py:130-133,157-158``).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        if state is None:
            state = self.init(particles)

        def body(carry, step_key):
            x, st = carry
            score = score_fn(x, step_key)
            phi, loss = self.velocity(x, score, st.step)
            x_new, opt_state = self.apply_update(
                x, -phi, st.opt_state, value_fn=value_fn
            )
            new_carry = (x_new, SVGDState(opt_state, st.step + 1))
            return new_carry, (x_new, loss, score.aux)

        # the whole solve runs under ONE jit: an eager lax.scan executes
        # compiled but without whole-program buffer donation/aliasing —
        # measured 2-3x slower per iteration on the remote TPU runtime at
        # the 1k-particle planning shape. The compiled fn is cached on the
        # instance per (score_fn, value_fn, n_steps) so repeated runs (e.g.
        # the flagship 500-iter sweeps over seeds) retrace only once.
        def solve(particles, state, keys):
            (x_final, st), (trace, losses, aux) = lax.scan(
                body, (particles, state), keys
            )
            trace = jnp.concatenate([particles[None], trace], axis=0)
            return x_final, st, trace, losses, aux

        # the cache entry keeps strong references to (self, score_fn,
        # value_fn) so their ids cannot be recycled onto different objects
        # while the compiled solve for them is alive
        cache_key = (id(self), id(score_fn), id(value_fn), n_steps)
        entry = _run_jit_cache.get(cache_key)
        if entry is None:
            entry = (jax.jit(solve), self, score_fn, value_fn)
            _run_jit_cache[cache_key] = entry
        keys = jax.random.split(key, n_steps)
        x_final, state, trace, losses, aux = entry[0](particles, state, keys)
        return x_final, state, RunData(trace=trace, loss=losses, aux=aux)

    def run_host_loop(
        self,
        particles: jax.Array,
        score_fn: ScoreFn,
        n_steps: int,
        key: Optional[jax.Array] = None,
        state: Optional[SVGDState] = None,
        trace_every: int = 0,
        value_fn=None,
    ) -> Tuple[jax.Array, SVGDState, RunData]:
        """Host-driven variant of :meth:`run`: one jitted dispatch per step.

        For very large per-step programs (e.g. 10⁶-pair signature Grams with
        the chunked adjoint) a single `n_steps`-long scan can exceed device
        program limits; here only the step is compiled. Keys are precomputed
        (host-side splitting between chained dispatches costs a round-trip).
        ``value_fn`` feeds line-search optimizers, exactly as in :meth:`run`.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        if state is None:
            state = self.init(particles)

        @jax.jit
        def one_step(x, st, step_key):
            score = score_fn(x, step_key)
            x2, st2 = self.step_update(x, st, score, value_fn=value_fn)
            loss = score.loss if score.loss is not None else jnp.zeros(())
            return x2, st2, loss

        keys = jax.random.split(key, n_steps)
        x = particles
        losses = []
        trace = [jnp.asarray(particles)] if trace_every else []
        for i in range(n_steps):
            x, state, loss = one_step(x, state, keys[i])
            losses.append(loss)
            if trace_every and (i + 1) % trace_every == 0:
                trace.append(x)
        # trace always ends at the final particles
        if not trace_every:
            trace = [particles, x]
        elif (n_steps % trace_every) != 0:
            trace.append(x)
        return x, state, RunData(
            trace=jnp.stack(trace), loss=jnp.stack(losses), aux=None
        )


def lbfgs(
    memory_size: int = 10, max_linesearch_steps: int = 15
) -> optax.GradientTransformationExtraArgs:
    """L-BFGS with the zoom strong-Wolfe line search.

    The TPU-native replacement for the reference's 1200-LoC vendored
    ``LBFGS.py`` (Armijo/Wolfe line search, Powell damping): optax's
    ``scale_by_lbfgs`` + ``scale_by_zoom_linesearch`` run the same
    curvature-pair recursion and Wolfe bracket entirely inside jit
    (``lax.while_loop``), so line-search probes compile into the solve
    instead of dispatching per probe. Pass a ``value_fn`` to
    :meth:`SVGD.step_update`/:meth:`SVGD.run` (DuSt builds one from the
    rollout costs automatically).
    """
    return optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps),
    )


def roll_opt_state(opt_state, particle_shape: Tuple[int, ...]):
    """Shift optimizer state with the receding horizon.

    When DuSt rolls its policies one step forward in time (``roll``), any
    optimizer-state leaf aligned with the policy tensor — adam moments
    ``[n, H, a]``, L-BFGS curvature-pair memories ``[m, n, H, a]`` — must
    roll along the horizon axis too, zero-filling the vacated last step
    (parity: the reference rolls its vendored LBFGS's ``d``,
    ``prev_flat_grad``, ``old_dirs``, ``old_stps``, ``dust.py:388-412``).
    Leaves that do not end in ``particle_shape`` (step counts, scalars) pass
    through unchanged.
    """
    nd = len(particle_shape)

    def roll_leaf(leaf):
        if getattr(leaf, "ndim", 0) >= nd and tuple(leaf.shape[-nd:]) == tuple(
            particle_shape
        ):
            rolled = jnp.roll(leaf, -1, axis=-2)
            return rolled.at[..., -1, :].set(0.0)
        return leaf

    return jax.tree_util.tree_map(roll_leaf, opt_state)


@dataclasses.dataclass(frozen=True)
class ScaledSVGD(SVGD):
    """Second-order (matrix) SVGD with a Gauss–Newton metric.

    ``M = mean_i(2 s_i s_iᵀ) + eps·I`` (reference ``svgd.py:257-266`` with
    ``eps = var(X)``), fed to a metric-scaled kernel; with
    ``precondition=True`` the velocity is preconditioned by ``M⁻¹``
    ("MatrixSVGD", ``svgd.py:245-247``).
    """

    metric: str = "GaussNewton"
    precondition: bool = True

    def velocity(self, x, score, step):
        if self.metric.lower() != "gaussnewton":
            raise NotImplementedError(
                f"metric '{self.metric}' not implemented (reference parity: only "
                "GaussNewton is implemented there either, svgd.py:210-225)"
            )
        n = x.shape[0]
        s = _flat(score.grad_log_p)
        # the GN metric is built from the LIKELIHOOD score only; the prior
        # gradient joins the score after (reference ordering, svgd.py:212 vs
        # :238-243 — the prior is added below the metric construction)
        # ddof=1: the reference's eps = X.var() is torch's UNBIASED variance
        eps = jnp.var(_flat(x), ddof=1)
        m = 2.0 * jnp.mean(s[:, :, None] * s[:, None, :], axis=0)
        m = m + eps * jnp.eye(m.shape[-1], dtype=m.dtype)
        if self.log_prior is not None:
            prior_grad = jax.grad(lambda xx: jnp.sum(self.log_prior(xx)))(x)
            s = s + _flat(prior_grad)

        k_xx, grad_k = self.kernel(_flat(x), _flat(x), M=m)
        if self.repulsion_schedule is not None:
            grad_k = grad_k * self.repulsion_schedule(step)

        phi = (k_xx @ s - grad_k) / n
        if self.precondition:
            phi = jnp.linalg.solve(m, phi.T).T
        phi = phi.reshape(x.shape)
        if self.gradient_mask is not None:
            phi = phi * self.gradient_mask
        loss = score.loss if score.loss is not None else jnp.linalg.norm(s)
        return phi, loss


def matrix_svgd(kernel=None, **kwargs) -> ScaledSVGD:
    """Reference's "MatrixSVGD" = ScaledSVGD with preconditioning
    (``dust.py:159-166``)."""
    from ..kernels import ScaledGaussianKernel

    return ScaledSVGD(
        kernel=kernel or ScaledGaussianKernel(), precondition=True, **kwargs
    )
