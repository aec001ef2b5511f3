"""On-device A/B: lazy one-hot beam reorder (SEAMLESS_LAZY_REORDER=1, the
round-3 default) vs classic fused-gather physical reorder (=0), at HEAD, on the
real TPU, with INTERLEAVED trials so axon service drift cannot masquerade as a
regression (VERDICT round 3, item 1).

Only the beam-decode stage differs between the modes (the encoder and
NAR+vocoder stages are identical executables), so this times the beam stage in
isolation: v2-large shapes, int8 weights + int8 KV, reference decode cap
min(S+200,1024)=262 steps with min_len pinning every step — exactly bench.py's
stage_beam. The env var is read at TRACE time (ops/transformer.py
decoder_cache_init), so one process traces both variants by toggling it
between jax.jit(...).lower() calls.

Usage: python scripts/ab_lazy_reorder.py [n_trials=7] [modes=lazy1,lazy0]
Prints one JSON line with per-trial ms lists, medians, and ms/step.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.ops.beam_search import (
        BeamSearchOptions, beam_search,
    )
    from seamless_communication_tpu.ops.quantization import quantize_params

    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    modes = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["lazy1", "lazy0"])

    MAX_FRAMES = 998
    S_ENC = MAX_FRAMES // 2 // 8
    TEXT_MAX_LEN = min(S_ENC + 200, 1024)   # 262
    BEAM = 5

    cfg = get_arch("base_v2")
    dtype = jnp.bfloat16
    K, V = BEAM, cfg.nllb.vocab_size
    prefix = jnp.array([[3, 5]], jnp.int32)

    def init_all():
        params = unity.unity_init(jax.random.PRNGKey(0), cfg, dtype=dtype)
        return quantize_params(params, bits=8)

    params_aval = jax.eval_shape(init_all)
    rng = np.random.default_rng(0)
    # enc output values are irrelevant for timing (min_len pins all 262 steps)
    enc = unity.EncoderOutput(
        jnp.asarray(rng.standard_normal((1, S_ENC, cfg.nllb.dim)) * 0.05, dtype),
        jnp.array([S_ENC], jnp.int32))
    enc_aval = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), enc)

    def stage_beam(params, enc, prefix):
        enc_bk = unity.EncoderOutput(jnp.repeat(enc.seqs, K, axis=0),
                                     jnp.repeat(enc.lengths, K, axis=0))
        step_fn, cache_fn = unity.make_text_decode_step(params, cfg, enc_bk)
        opts = BeamSearchOptions(beam_size=K, max_len=TEXT_MAX_LEN,
                                 min_len=TEXT_MAX_LEN - 8,
                                 pad_idx=0, unk_idx=1, eos_idx=3)
        res = beam_search(step_fn, cache_fn(TEXT_MAX_LEN, True), prefix,
                          jnp.array([2], jnp.int32), opts, V, src_to_step=True)
        return res.tokens[:, 0], res.lengths[:, 0]

    t0 = time.time()
    lowered = {}
    for mode in modes:
        os.environ["SEAMLESS_LAZY_REORDER"] = mode[-1]
        lowered[mode] = jax.jit(stage_beam).lower(params_aval, enc_aval, prefix)
    print(f"# lowered both at {time.time()-t0:.1f}s", flush=True)

    init_box = {}

    def run_init():
        p = init_all()
        jax.block_until_ready(p)
        init_box["params"] = p

    t0 = time.time()
    with ThreadPoolExecutor(3) as ex:
        fi = ex.submit(run_init)
        fs = [(k, ex.submit(l.compile)) for k, l in lowered.items()]
        compiled = {k: f.result() for k, f in fs}
        compile_s = time.time() - t0
        fi.result()
    init_s = time.time() - t0
    params = init_box["params"]
    print(f"# compiled {compile_s:.1f}s, init+compile wall {init_s:.1f}s",
          flush=True)

    def run(mode):
        t0 = time.time()
        toks, lens = compiled[mode](params, enc, prefix)
        np.asarray(toks)  # full sync through the axon tunnel
        return (time.time() - t0) * 1000.0

    # first-launch loads (not timed)
    for m in compiled:
        run(m)

    trials = {m: [] for m in compiled}
    for i in range(n_trials):
        order = modes if i % 2 == 0 else modes[::-1]
        for m in order:
            trials[m].append(round(run(m), 1))

    out = {"metric": "beam_stage_ms_ab_lazy_reorder",
           "steps": TEXT_MAX_LEN,
           "trials": trials}
    for m, ts in trials.items():
        out[f"{m}_p50_ms"] = round(float(np.median(ts)), 1)
        out[f"{m}_ms_per_step"] = round(float(np.median(ts)) / TEXT_MAX_LEN, 3)
    out["compile_s"] = round(compile_s, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _wait_for_backend

    _wait_for_backend(float(os.environ.get("BENCH_BACKEND_DEADLINE_S", "900")))
    main()
