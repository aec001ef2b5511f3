"""On-device A/B: int8 vs group-int4 weight-only quantization on the beam
decode stage (VERDICT round 3, item 3). Single-stream beam-5 decode is
HBM-bound on weight reads (the 262 MB int8 vocab table + ~24x26 MB layer
weights per step, docs/performance.md); int4 halves both. Interleaved trials,
v2-large shapes, reference decode cap (262 steps), int8 KV both sides.

Usage: python scripts/ab_int4.py [n_trials=7]
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

    MAX_FRAMES = 998
    S_ENC = MAX_FRAMES // 2 // 8
    TEXT_MAX_LEN = min(S_ENC + 200, 1024)   # 262
    BEAM = 5

    cfg = get_arch("base_v2")
    dtype = jnp.bfloat16
    K, V = BEAM, cfg.nllb.vocab_size
    prefix = jnp.array([[3, 5]], jnp.int32)

    def init_bits(bits):
        params = unity.unity_init(jax.random.PRNGKey(0), cfg, dtype=dtype)
        return quantize_params(params, bits=bits)

    avals = {b: jax.eval_shape(lambda b=b: init_bits(b)) for b in (8, 4)}
    rng = np.random.default_rng(0)
    enc = unity.EncoderOutput(
        jnp.asarray(rng.standard_normal((1, S_ENC, cfg.nllb.dim)) * 0.05, dtype),
        jnp.array([S_ENC], jnp.int32))
    enc_aval = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), enc)

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
    lowered = {f"w{b}": jax.jit(stage_beam).lower(avals[b], enc_aval, prefix)
               for b in (8, 4)}
    print(f"# lowered at {time.time()-t0:.1f}s", flush=True)

    init_box = {}

    def run_init(b):
        p = init_bits(b)
        jax.block_until_ready(p)
        init_box[b] = p

    t0 = time.time()
    with ThreadPoolExecutor(4) as ex:
        fis = [ex.submit(run_init, b) for b in (8, 4)]
        fs = [(k, ex.submit(l.compile)) for k, l in lowered.items()]
        compiled = {k: f.result() for k, f in fs}
        compile_s = time.time() - t0
        [f.result() for f in fis]
    print(f"# compiled {compile_s:.1f}s, wall {time.time()-t0:.1f}s", flush=True)

    def run(mode):
        b = int(mode[1:])
        t0 = time.time()
        toks, lens = compiled[mode](init_box[b], enc, prefix)
        np.asarray(toks)
        return (time.time() - t0) * 1000.0

    for m in compiled:
        run(m)

    trials = {m: [] for m in compiled}
    for i in range(n_trials):
        order = ("w8", "w4") if i % 2 == 0 else ("w4", "w8")
        for m in order:
            trials[m].append(round(run(m), 1))

    out = {"metric": "beam_stage_ms_ab_int4", "steps": TEXT_MAX_LEN,
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
