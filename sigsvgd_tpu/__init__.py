"""sigsvgd_tpu — a TPU-native Stein-variational MPC & trajectory-optimization framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
PyTorch framework `lubaroli/sigsvgd` (see SURVEY.md): SVGD-family samplers,
RBF/IMQ/path-signature kernels (including a native Goursat-PDE signature-kernel
Gram solver), DuSt and DISCO MPC controllers, batched differentiable dynamics
models, a differentiable 7-DoF robot kinematics stack with learned collision
costs, and a multi-device particle/rollout sharding layer.

Design stance (TPU-first):
  * pure, jittable functions over explicit state pytrees — no stateful modules
  * `vmap` for particle/sample axes, `lax.scan` for horizon/PDE recurrences
  * Pallas kernels for the signature-kernel PDE wavefront and fused SVGD update
  * `shard_map` over `jax.sharding.Mesh` for multi-chip scaling
"""

__version__ = "0.1.0"

from . import utils, kernels, inference, models, controllers, parallel  # noqa: F401
