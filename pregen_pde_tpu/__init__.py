"""pregen_pde_tpu — TPU-native multi-difficulty PDE data generation & neural-operator
framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
`Naman-Choudhary-AI-ML/pregenerating-pde` (see /root/repo/SURVEY.md):

- ``fields``   — Gaussian-random-field IC/coefficient samplers and random obstacle
  geometry (masks + SDFs) generated on device.
- ``solvers``  — jit/vmap-able PDE solvers replacing the reference's OpenFOAM layer:
  pseudo-spectral 2-D Navier-Stokes vorticity, 1-D viscous Burgers, FD
  heat/diffusion-reaction, steady Darcy, and masked-geometry incompressible NS
  (volume penalization) for the FPO/LDC workloads.
- ``datagen``  — trajectory factories: ``vmap`` over ICs, ``shard_map`` over a device
  mesh, streaming writers emitting the reference data contract
  ``(N, T, H, W, 6)`` with channels ``[Ux, Uy, p, Re, mask, SDF]``.
- ``ops``      — TPU-native equivalents of the reference's CUDA ops
  (``filtered_lrelu``, ``upfirdn2d``, ``bias_act``).
- ``models``   — Flax implementations of CNO, scOT/Poseidon, FNO, FFNO.
- ``training`` — one unified harness: time-pair datasets, difficulty mixing,
  relative-Lp losses, AR rollout train/eval, orbax checkpoints.
- ``parallel`` — mesh/sharding utilities (DP batch sharding, grid sharding).
"""

__version__ = "0.1.0"
