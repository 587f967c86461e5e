"""Schedulers, UTF, spaces, distributions, obstacle maps."""
import jax
import jax.numpy as jnp
import numpy as np

from sigsvgd_tpu.utils import distributions as du
from sigsvgd_tpu.utils import obstacle_map as om
from sigsvgd_tpu.utils import schedulers
from sigsvgd_tpu.utils.spaces import Box
from sigsvgd_tpu.utils.utf import MerweScaledUTF


def test_schedulers_reference_values():
    sq = schedulers.square_root(2.0)
    np.testing.assert_allclose(float(sq(0)), 2.0)
    np.testing.assert_allclose(float(sq(3)), 2.0 * 4**-0.5)

    fa = schedulers.factor(1.0, 0.5, minimum=0.1)
    np.testing.assert_allclose(float(fa(2)), 0.25)
    np.testing.assert_allclose(float(fa(10)), 0.1)

    co = schedulers.cosine(1.0, 0.0, final_step=100, warmup_steps=20)
    np.testing.assert_allclose(float(co(10)), 1.0)
    np.testing.assert_allclose(float(co(200)), 0.0)
    mid = float(co(60))
    assert 0.0 < mid < 1.0


def test_utf_recovers_gaussian_moments():
    utf = MerweScaledUTF(n=3)
    mean = jnp.asarray([1.0, -2.0, 0.5])
    a = np.random.default_rng(0).standard_normal((3, 3)).astype(np.float32)
    cov = jnp.asarray(a @ a.T + np.eye(3, dtype=np.float32))
    sigmas = utf.compute_sigma_points(mean, cov)
    assert sigmas.shape == (3, 7)
    mu, k = utf.unscented_transform(sigmas)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mean), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(k), np.asarray(cov), rtol=1e-2, atol=1e-3)


def test_box_space():
    box = Box.create(3, low=-1.0, high=[1.0, 2.0, 3.0])
    x = box.sample(jax.random.PRNGKey(0), (100,))
    assert x.shape == (100, 3)
    assert float(x.min()) >= -1.0
    assert float(x[:, 0].max()) <= 1.0
    clipped = box.clip(jnp.asarray([[5.0, -5.0, 2.5]]))
    np.testing.assert_allclose(np.asarray(clipped[0]), [1.0, -1.0, 2.5])
    assert box.bounded
    assert not Box.create(2).bounded


def test_gaussian_distribution_sample_and_logprob():
    dist = du.Gaussian(mean=jnp.asarray([1.0, -1.0]), cov=jnp.asarray([[0.5, 0.1], [0.1, 0.3]]))
    x = du.sample(dist, jax.random.PRNGKey(0), (5000,))
    np.testing.assert_allclose(np.asarray(x.mean(0)), [1.0, -1.0], atol=0.05)
    np.testing.assert_allclose(np.cov(np.asarray(x).T), np.asarray(dist.cov), atol=0.05)
    lp = du.log_prob(dist, dist.mean[None])
    from scipy.stats import multivariate_normal

    want = multivariate_normal(np.asarray(dist.mean), np.asarray(dist.cov)).logpdf(
        np.asarray(dist.mean)
    )
    np.testing.assert_allclose(float(lp[0]), want, rtol=1e-4)


def test_gmm_distribution_moments():
    gmm = du.ParticleGMM(
        means=jnp.asarray([[0.0, 0.0], [2.0, 2.0]]),
        var=jnp.asarray(0.1),
        weights=jnp.asarray([1.0, 1.0]),
    )
    mean, cov = du.moments(gmm)
    np.testing.assert_allclose(np.asarray(mean), [1.0, 1.0])
    x = du.sample(gmm, jax.random.PRNGKey(1), (4000,))
    np.testing.assert_allclose(np.asarray(x.mean(0)), [1.0, 1.0], atol=0.1)


def test_rejection_sampling_respects_bounds():
    dist = du.Gaussian(mean=jnp.asarray([0.0]), cov=jnp.asarray([4.0]))
    x = du.sample_rejection(dist, jax.random.PRNGKey(0), (2000,), low=0.5, high=2.0)
    assert float(x.min()) >= 0.5 and float(x.max()) <= 2.0
    # distribution is truncated-normal-ish: mass concentrated near 0.5
    assert float(jnp.mean(x)) < 1.4


def test_obstacle_map_lookup():
    omap = om.generate_obstacle_map(
        (4, 4), om.obstacle_preset("single_centred", 1.0), 0.05
    )
    assert float(om.get_collisions(omap, jnp.asarray([0.0, 0.0]))) == 1.0
    assert float(om.get_collisions(omap, jnp.asarray([1.2, 1.2]))) == 0.0
    # borders are walls; out-of-bounds clamps into the wall
    assert float(om.get_collisions(omap, jnp.asarray([10.0, 0.0]))) == 1.0
    # batched lookup
    vals = om.get_collisions(omap, jnp.asarray([[[0.0, 0.0], [1.2, 1.2]]]))
    np.testing.assert_allclose(np.asarray(vals), [[1.0, 0.0]])


def test_obstacle_presets_shapes():
    assert len(om.obstacle_preset("grid_3x3")) == 9
    assert len(om.obstacle_preset("sm_grid_4x4", 0.6)) == 16
    assert len(om.obstacle_preset("grid_6x6")) == 36
    assert len(om.obstacle_preset("staggered_3-2-3")) == 10
    assert len(om.obstacle_preset("staggered_4-3-4-3-4")) == 18
