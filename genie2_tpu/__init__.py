"""genie2_tpu — a TPU-native (JAX/XLA/Pallas) protein backbone diffusion framework.

A from-scratch rebuild of the capabilities of the Genie 2 fork at
marvinli00/genie2 (reference mounted at /root/reference): an SE(3)-equivariant
denoiser over rigid Frenet-Serret frames, a cosine-schedule DDPM over
C-alpha coordinates, motif-conditional training, and three inference modes
(length-swept unconditional generation, fixed-placement motif scaffolding,
and twisted-diffusion SMC scaffolding with unknown motif placement).

Design notes (TPU-first, not a port):
  * pure-functional geometry on a `Rigid` pytree (genie2_tpu.geometry)
  * flax.linen denoiser with OpenFold-compatible initializers (genie2_tpu.nn)
  * schedule + q-sample/posterior as pure functions (genie2_tpu.diffusion)
  * sampling loops as jit + lax.scan, one compiled step for all 1000
    diffusion steps (genie2_tpu.sampling)
  * data-parallel training over a jax.sharding.Mesh; collectives are
    XLA-generated (genie2_tpu.parallel, genie2_tpu.train)
  * Pallas TPU kernels for the hot pair-stack ops with jnp fallbacks
    (genie2_tpu.ops)
"""

__version__ = "0.1.0"
