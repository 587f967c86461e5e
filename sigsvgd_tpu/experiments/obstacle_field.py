"""2-D spline planning through Gaussian-mixture obstacle fields.

Counterpart of reference ``examples/script_planning_obstacle_field.py``:
knot particles expand to 2-D spline paths; the cost is the negative log of
clearance under a mixture-of-Gaussians obstacle density (Halton-sampled
obstacle centers) plus path length; methods: pathsig / svgd / sgd.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Dict, Tuple

import jax

from ..utils.helper import enable_compile_cache
import jax.numpy as jnp
import numpy as np

from ..inference import SVGD
from ..inference.score import pathsig_score, sgd_score, svgd_score
from ..kernels import GaussianKernel, SignatureKernel
from ..utils import schedulers
from ..utils.splines import spline_trajectory


def halton(n: int, base: int) -> np.ndarray:
    """Halton low-discrepancy sequence (the reference samples obstacle centers
    this way, ``script_planning_obstacle_field.py:366-375``)."""
    out = np.zeros(n)
    for i in range(n):
        f, r = 1.0, 0.0
        idx = i + 1
        while idx > 0:
            f /= base
            r += f * (idx % base)
            idx //= base
        out[i] = r
    return out


@dataclasses.dataclass(frozen=True)
class ObstacleField:
    centers: Tuple[Tuple[float, float], ...]
    sigma: float = 0.35

    @staticmethod
    def create(n_obstacles: int = 12, extent: float = 8.0) -> "ObstacleField":
        xs = halton(n_obstacles, 2) * extent - extent / 2
        ys = halton(n_obstacles, 3) * extent - extent / 2
        return ObstacleField(tuple(zip(map(float, xs), map(float, ys))))

    def density(self, xy: jax.Array) -> jax.Array:
        c = jnp.asarray(self.centers)  # [k, 2]
        d2 = jnp.sum((xy[..., None, :] - c) ** 2, axis=-1)
        return jnp.exp(-0.5 * d2 / self.sigma**2).sum(-1)


@dataclasses.dataclass(frozen=True, eq=False)
class FieldProblem:
    field: ObstacleField
    start: Tuple[float, float] = (-4.0, -4.0)
    goal: Tuple[float, float] = (4.0, 4.0)
    timesteps: int = 100
    w_obstacle: float = 5.0
    w_length: float = 1.0

    def batch_cost(self, x: jax.Array):
        """x: knot particles [batch, n_free, 2]."""
        batch = x.shape[0]
        knots = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.asarray(self.start), (batch, 1, 2)),
                x,
                jnp.broadcast_to(jnp.asarray(self.goal), (batch, 1, 2)),
            ],
            axis=1,
        )
        path = spline_trajectory(knots, self.timesteps)  # [batch, T, 2]
        obst = self.field.density(path).sum(-1)
        from ..utils.math import safe_norm

        length = safe_norm(path[:, 1:] - path[:, :-1]).sum(-1)
        cost = self.w_obstacle * obst + self.w_length * length
        return cost, {"obstacle": obst, "length": length, "paths": path}


def run(
    method: str = "pathsig",
    n_iter: int = 300,
    batch: int = 16,
    n_free_knots: int = 4,
    lr: float = 0.02,
    seed: int = 0,
) -> Dict:
    problem = FieldProblem(ObstacleField.create())
    key = jax.random.PRNGKey(seed)
    x0 = jax.random.uniform(key, (batch, n_free_knots, 2), minval=-4.0, maxval=4.0)

    if method == "svgd":
        score = svgd_score(problem.batch_cost, GaussianKernel())
    elif method == "sgd":
        score = sgd_score(problem.batch_cost)
    else:
        score = pathsig_score(
            problem.batch_cost, SignatureKernel(dyadic_order=3, bandwidth=3.0)
        )
    svgd = SVGD(
        optimizer=None,
        lr=lr,
        repulsion_schedule=schedulers.cosine(1.0, 0.0, 3 * n_iter // 4, n_iter // 4),
    )
    x_final, _, data = jax.jit(
        lambda x: svgd.run(x, score, n_iter, key=key)
    )(x0)
    costs, aux = problem.batch_cost(x_final)
    return {
        "final_costs": np.asarray(costs),
        "best_cost": float(jnp.min(costs)),
        "mean_cost": float(jnp.mean(costs)),
        "paths": np.asarray(aux["paths"]),
    }


def main():
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", default="pathsig", choices=["pathsig", "svgd", "sgd"])
    parser.add_argument("--n-iter", type=int, default=300)
    args = parser.parse_args()
    res = run(method=args.method, n_iter=args.n_iter)
    print(
        json.dumps(
            {
                "method": args.method,
                "best_cost": round(res["best_cost"], 3),
                "mean_cost": round(res["mean_cost"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
