"""chrono_tpu — a TPU-native multiphysics simulation framework.

A from-scratch re-design (not a port) of the capabilities of Project Chrono
(reference: uwsbel/chrono-wisc) for TPU hardware:

* scene state as JAX pytrees stepped under ``jit`` / ``lax.scan``;
* implicit DVI/SMC time integrators expressed as XLA linear/VI solves;
* collision detection and granular/SPH force pipelines as sort + segment-sum
  data-parallel programs with Pallas kernels on the hot paths;
* scale-out via ``jax.sharding`` over ICI/DCN meshes instead of OpenMP/MPI.

Subpackages
-----------
core        SO(3)/SE(3) math, frames, motion functions
physics     multibody scene model: bodies, joints, motors, force elements
solver      constraint solvers (dense Schur, APGD, BB, PSOR, ADMM) + cone projection
collision   uniform-grid broadphase, neighbor lists, analytic narrowphase
dem         granular DEM (SMC, Hertz–Mindlin with friction history)
fsi         SPH fluid dynamics + fluid–solid interaction (BCE markers, CRM)
fea         nonlinear finite elements (ANCF)
vehicle     vehicle templates: suspensions, tires, drivers, terrain
models      ready-made parameterized models
parallel    device-mesh sharding, halo exchange
ops         low-level primitives (segment ops, Pallas kernels)
io          checkpointing, output writers, YAML specs
utils       validation oracles, samplers, timers
"""

__version__ = "0.1.0"
