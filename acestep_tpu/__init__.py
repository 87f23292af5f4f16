"""ACE-Step TPU: a TPU-native (JAX/XLA/Pallas) music generation framework.

A from-scratch rebuild of the capabilities of ACE-Step 1.5
(`/root/reference`): a 5 Hz LM planner + 25 Hz flow-matching DiT +
48 kHz Oobleck audio VAE, designed for TPU from the ground up:

- Pure-functional models (param pytrees + jit-compiled apply fns).
- Static shapes everywhere (duration buckets, mask discipline) so the
  whole denoising trajectory compiles to one XLA program.
- The 8-step turbo sampler runs as a single `lax.scan` with cross-attn
  K/V computed once outside the scan.
- Multi-chip scaling via `jax.sharding.Mesh` + NamedSharding (batch
  sharded over ICI, weights replicated), not NCCL-style collectives.
"""

__version__ = "0.1.0"
