"""seamless_communication_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of facebookresearch/seamless_communication.

Design principles (see SURVEY.md for the reference analysis):

- **Functional core**: every model is a pure function ``apply(params, inputs) -> outputs``
  over an explicit parameter pytree (nested dicts of ``jax.Array``). No module objects hold
  state; configs are frozen dataclasses. This makes ``jax.jit`` / ``pjit`` / ``shard_map``
  composition trivial and checkpoint conversion transparent.
- **Scan-stacked layers**: repeated transformer/conformer layers store parameters stacked
  along a leading layer axis and execute under ``jax.lax.scan`` — O(1) compile cost in
  depth and natural pipeline-parallel sharding.
- **Static shapes everywhere**: padding masks derived from lengths; beam search, duration
  upsampling and streaming all run with fixed maximum shapes under ``lax.while_loop`` /
  ``lax.scan`` so a single compiled program serves every request.
- **bf16 compute, fp32 accumulation**: matmuls run on the MXU in bfloat16 with
  ``preferred_element_type=float32``; layer norms and logits stay fp32.
- **Parallelism first-class**: a single ``jax.sharding.Mesh`` with axes ``("data","model")``;
  parameter/activation sharding rules live in ``parallel/``.
"""

__version__ = "0.1.0"
