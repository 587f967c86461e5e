"""Demo: SVGD particle movies on the toy densities.

Counterpart of reference ``tests/test_svgd.py`` (movie output) and
``examples/script_sequential_distribution.ipynb``: runs SVGD on the
double-banana and star-Gaussian targets and writes frame PNGs (+ mp4 when
ffmpeg is available). Run: ``python examples/demo_svgd_toy.py``.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from sigsvgd_tpu.inference import SVGD, ScoreResult  # noqa: E402
from sigsvgd_tpu.kernels import GaussianKernel  # noqa: E402
from sigsvgd_tpu.models import DoubleBanana, star_gaussian  # noqa: E402
from sigsvgd_tpu.utils.plots import create_video_from_plots, plot_particles_2d  # noqa: E402


def run(name, target, steps=300):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (150, 2)) * 0.5

    def score_fn(x, key):
        return ScoreResult(grad_log_p=target.grad_log_p(x), loss=-target.logp(x))

    svgd = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.05))
    xf, _, data = jax.jit(lambda x: svgd.run(x, score_fn, steps))(x0)
    out = f"data/svgd_{name}"
    frames = plot_particles_2d(data.trace, logp_fn=target.logp, out_dir=out, every=20)
    movie = create_video_from_plots(out, out)
    print(f"{name}: final mean logp {float(jnp.mean(target.logp(xf))):.2f}, "
          f"{len(frames)} frames -> {movie or out}")


def main():
    run("double_banana", DoubleBanana())
    run("star_gaussian", star_gaussian(10.0, 5))


if __name__ == "__main__":
    main()
