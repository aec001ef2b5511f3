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


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (OPT-IN: set SEAMLESS_COMPILE_CACHE=1
    or =<dir>). Makes CLI/server restarts warm on locally attached chips, where
    production-dim programs otherwise pay minutes of compile. Leave off for
    remote-tunneled backends (axon): executable serialization through the
    tunnel measured SLOWER than recompiling against the remote server's own
    cache (94 s vs 35 s on the S2ST bench program)."""
    import os

    val = os.environ.get("SEAMLESS_COMPILE_CACHE", "")
    if not val or val == "0":
        return
    cache_dir = (val if val != "1" else "") or os.path.join(
        os.path.expanduser("~"), ".cache", "seamless_tpu", "xla_cache")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - old jax or read-only home
        pass


_enable_compilation_cache()
