"""super_tpu: a TPU-native (JAX/XLA/Pallas) surgical-perception framework.

Re-implements the capabilities of SuPer / Semantic-SuPer (deformable tissue
tracking with an Embedded-Deformation graph) as a TPU-first design:

- fixed-capacity, mask-carried SoA state in pytrees (no dynamic shapes),
- a pure ``step(state, frame) -> state`` function under ``jax.jit``,
- analytic-Jacobian Levenberg-Marquardt with batched damping hypotheses,
- ``vmap`` over concurrent streams + ``shard_map`` over device meshes,
- Pallas kernels for the hot ops (KNN, JTJ block assembly, splatting).

Reference behavior: ucsdarclab/Python-SuPer (see SURVEY.md for the map).
"""

__version__ = "0.1.0"

from super_tpu import config  # noqa: F401
