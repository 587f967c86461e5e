"""Dynamics-model step tests vs hand-computed updates + rollout engine."""
import jax
import jax.numpy as jnp
import numpy as np

from sigsvgd_tpu.models import (
    CartPoleModel,
    ParticleModel,
    PendulumModel,
    SkidSteerModel,
    rollout,
)


def test_particle_euler_step():
    model = ParticleModel.create(dt=0.1, mass=2.0, map_size=(4, 4), map_cell_size=0.1)
    s = jnp.asarray([[1.0, -1.0, 0.5, 0.2]])
    a = jnp.asarray([[2.0, -4.0]])
    nxt = np.asarray(model.step(s, a))
    # accel = a / m; pos += vel*dt; vel += accel*dt
    np.testing.assert_allclose(nxt[0], [1.05, -0.98, 0.6, 0.0], atol=1e-5)


def test_particle_velocity_control():
    model = ParticleModel.create(
        dt=0.5, control_type="velocity", max_speed=1.0, map_size=(4, 4), map_cell_size=0.1
    )
    s = jnp.asarray([[0.0, 0.0]])
    a = jnp.asarray([[2.0, -0.5]])  # clamped to (1, -0.5)
    nxt = np.asarray(model.step(s, a))
    np.testing.assert_allclose(nxt[0], [0.5, -0.25], atol=1e-6)


def test_particle_crash_freezes():
    model = ParticleModel.create(
        dt=0.1,
        with_obstacle=True,
        obst_preset="single_centred",
        obst_width=1.0,
        map_size=(4, 4),
        map_cell_size=0.05,
        can_crash=True,
    )
    inside = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])  # at the central obstacle
    nxt = np.asarray(model.step(inside, jnp.zeros((1, 2))))
    np.testing.assert_allclose(nxt, np.asarray(inside), atol=1e-6)
    outside = jnp.asarray([[1.5, 1.5, 1.0, 1.0]])
    nxt2 = np.asarray(model.step(outside, jnp.zeros((1, 2))))
    assert not np.allclose(nxt2, np.asarray(outside))


def test_pendulum_step_hand_computed():
    model = PendulumModel(dt=0.05)
    s = jnp.asarray([[0.3, 0.5]])
    a = jnp.asarray([[1.0]])
    theta, theta_d = 0.3, 0.5
    tdd = -3 * 9.8 / 2 * np.sin(theta + np.pi) + 3 * 1.0
    td_new = np.clip(theta_d + 0.05 * tdd, -8, 8)
    th_new = theta + td_new * 0.05
    nxt = np.asarray(model.step(s, a))
    np.testing.assert_allclose(nxt[0], [th_new, td_new], rtol=1e-5)


def test_pendulum_uncertain_params_broadcast():
    model = PendulumModel(dt=0.05)
    params = model.params_to_dict(jnp.asarray([[9.8, 1.0, 1.0], [5.0, 2.0, 0.5]]))
    s = jnp.broadcast_to(jnp.asarray([0.3, 0.5]), (2, 2))
    a = jnp.ones((2, 1))
    nxt = np.asarray(model.step(s, a, params))
    assert nxt.shape == (2, 2)
    assert not np.allclose(nxt[0], nxt[1])  # different params, different step


def test_cartpole_step_matches_manual():
    model = CartPoleModel(dt=0.02)
    s = jnp.asarray([[0.1, -0.2, 0.05, 0.3]])
    a = jnp.asarray([[0.5]])
    nxt = np.asarray(model.step(s, a))
    assert nxt.shape == (1, 4)
    # position integrates current velocity
    np.testing.assert_allclose(nxt[0, 0], 0.1 + 0.02 * -0.2, rtol=1e-5)
    np.testing.assert_allclose(nxt[0, 2], 0.05 + 0.02 * 0.3, rtol=1e-5)


def test_skid_steer_straight_line():
    model = SkidSteerModel(dt=1.0)
    s = jnp.zeros((1, 5))
    a = jnp.asarray([[0.25, 0.25]])  # equal wheels → straight
    nxt = np.asarray(model.step(s, a))
    v = 0.5 * np.pi * 0.0625
    np.testing.assert_allclose(nxt[0, 0], v, rtol=1e-5)  # forward in x
    np.testing.assert_allclose(nxt[0, 1:3], 0.0, atol=1e-6)


def test_skid_steer_turns():
    model = SkidSteerModel(dt=1.0)
    s = jnp.zeros((1, 5))
    a = jnp.asarray([[0.25, -0.25]])  # opposite wheels → rotate in place-ish
    nxt = np.asarray(model.step(s, a))
    assert abs(nxt[0, 2]) > 0.1  # theta changed


def test_rollout_engine_matches_manual_loop():
    model = PendulumModel(dt=0.05)
    key = jax.random.PRNGKey(0)
    s0 = jnp.asarray([0.1, 0.0])
    acts = jax.random.normal(key, (3, 7, 1))  # 3 rollouts, H=7
    traj = rollout(model, s0, acts)
    assert traj.shape == (3, 8, 2)
    # manual loop
    s = jnp.broadcast_to(s0, (3, 2))
    for t in range(7):
        s = model.step(s, acts[:, t])
        np.testing.assert_allclose(np.asarray(traj[:, t + 1]), np.asarray(s), rtol=1e-5)


def test_rollout_with_params_axis():
    model = PendulumModel(dt=0.05)
    acts = jnp.ones((2, 4, 5, 1)) * 0.3  # [P=2, n=4, H=5, a]
    params = {
        k: v.reshape(2, 1, 1)
        for k, v in model.params_to_dict(
            jnp.asarray([[9.8, 1.0, 1.0], [3.0, 1.5, 0.7]])
        ).items()
    }
    traj = rollout(model, jnp.asarray([0.0, 0.0]), acts, params)
    assert traj.shape == (2, 4, 6, 2)
    assert not np.allclose(np.asarray(traj[0]), np.asarray(traj[1]))
