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

    def init_bf16():
        return unity.unity_init(jax.random.PRNGKey(0), cfg, dtype=dtype)

    def init_bits(bits):
        return quantize_params(init_bf16(), bits=bits)

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

    # int4 arrays cannot exist AT REST on this backend: a pre-quantized S4
    # arg hits a device_put relayout recursion, and host fetch of S4 is
    # UNIMPLEMENTED. So each mode quantizes IN-GRAPH (hoisted before the
    # decode loop): the while-loop body still reads int8/int4 weights from
    # HBM each of the 262 steps, which is the effect under test. The one-off
    # in-graph quantize cost is measured separately below and is similar for
    # both modes (~read 5 GB bf16 + write the table).
    t0 = time.time()
    bf16 = init_bf16()
    jax.block_until_ready(bf16)
    print(f"# init {time.time()-t0:.1f}s", flush=True)

    MODES = (("w8", 8, 128), ("w4g128", 4, 128), ("w4col", 4, 0))
    fns = {}
    for mode, bits, grp in MODES:
        fns[mode] = jax.jit(
            lambda p, enc, prefix, b=bits, g=grp: stage_beam(
                quantize_params(p, bits=b, int4_group=g), enc, prefix))
    qfn = jax.jit(lambda p: jax.tree.map(
        lambda a: a.reshape(-1)[0].astype(jnp.float32),
        quantize_params(p, bits=4)))

    # quantize-only overhead probe (int8 form; fetches one scalar per leaf)
    np.asarray(jax.tree.leaves(qfn(bf16))[0])
    t0 = time.time()
    np.asarray(jax.tree.leaves(qfn(bf16))[0])
    quant_ms = round((time.time() - t0) * 1000.0, 1)

    compile_s = {}
    trials = {m: [] for m in fns}

    def run(mode):
        t0 = time.time()
        toks, _ = fns[mode](bf16, enc, prefix)
        np.asarray(toks)
        return (time.time() - t0) * 1000.0

    for m in fns:
        t0 = time.time()
        run(m)
        compile_s[m] = round(time.time() - t0, 1)
        run(m)
    names = [m for m, _, _ in MODES]
    for i in range(n_trials):
        order = names if i % 2 == 0 else names[::-1]
        for m in order:
            trials[m].append(round(run(m), 1))

    out = {"metric": "beam_stage_ms_ab_int4", "steps": TEXT_MAX_LEN,
           "trials": trials}
    for m, ts in trials.items():
        out[f"{m}_p50_ms"] = round(float(np.median(ts)), 1)
        out[f"{m}_ms_per_step"] = round(float(np.median(ts)) / TEXT_MAX_LEN, 3)
    out["compile_s"] = compile_s
    out["inline_quantize_ms"] = quant_ms
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _wait_for_backend

    _wait_for_backend(float(os.environ.get("BENCH_BACKEND_DEADLINE_S", "900")))
    main()
