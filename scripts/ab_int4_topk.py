"""On-device probe: vocab projection + top-k on the int4 (per-column) table
(VERDICT round 4, item 3 second half). At int8 the Pallas candidate-beam
kernel (ops/kernels/vocab_topk.py v2) measured 1.14 ms/call vs XLA's fused
1.10 — parked. int4 halves the table read (131 MB), where the kernel's
single-pass structure could finally win IF Mosaic can consume an int4
operand. This probe times, at the production shape (N=5, V=256102, D=1024):

  xla_i8   XLA fused projection+topk, int8 table (the shipping baseline)
  xla_i4   XLA fused projection+topk, int4 per-column table
  pallas_i4  the v2 kernel fed the int4 table (compile attempt; a Mosaic
             rejection is itself the documented answer)

int4 cannot exist at rest on this backend, so tables are quantized in-graph.
To cancel the (dominant, ~60 ms) in-graph quantize cost, each jit runs the
projection+topk in a fori_loop whose trip count is a static parameter and the
per-call cost is the SLOPE between two trip counts — quantize, dispatch and
tunnel latency cancel exactly.

Usage: python scripts/ab_int4_topk.py [n_trials=7]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.ops.quantization import (
        quantize_embedding, quantize_embedding_int4,
    )

    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    N, V, D, K = 5, 256102, 1024, 5
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((V, D)) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)

    def topk_from_logits(logits):
        vals, idx = jax.lax.top_k(logits, 2 * K + 1)
        logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        return vals, idx, logz

    from seamless_communication_tpu.ops.kernels.vocab_topk import (
        int8_vocab_topk_v2,
    )

    def make_looped(kind, n_inner):
        """quantize once, then run projection+topk n_inner times on slightly
        different x (iteration folded into x so XLA cannot hoist the body)."""
        def f(emb, x):
            if kind == "xla_i8":
                q, s = quantize_embedding(emb)
                srow = s
            else:
                q, s4 = quantize_embedding_int4(emb, group=1 << 30)
                srow = s4[:, 0]

            def body(i, acc):
                xi = x + (i.astype(x.dtype) * 1e-3)
                if kind == "pallas_i4":
                    vals, idx, logz = int8_vocab_topk_v2(xi, q, srow, K)
                else:
                    logits = jnp.matmul(
                        xi, q.T.astype(x.dtype),
                        preferred_element_type=jnp.float32) * srow[None, :]
                    vals, idx, logz = topk_from_logits(logits)
                return (acc[0] + jnp.sum(vals), acc[1] + jnp.sum(logz))

            return jax.lax.fori_loop(
                0, n_inner, body, (jnp.float32(0.0), jnp.float32(0.0)))
        return jax.jit(f)

    LO, HI = 4, 24
    out = {"metric": "vocab_topk_int4_probe", "N": N, "V": V, "D": D, "K": K,
           "inner": [LO, HI]}
    results = {}
    for kind in ("xla_i8", "xla_i4", "pallas_i4"):
        try:
            flo, fhi = make_looped(kind, LO), make_looped(kind, HI)
            for f in (flo, fhi):             # compile + first launch
                np.asarray(f(emb, x)[0])

            def run(f):
                t0 = time.time()
                np.asarray(f(emb, x)[0])
                return (time.time() - t0) * 1000.0

            tlo = [run(flo) for _ in range(n_trials)]
            thi = [run(fhi) for _ in range(n_trials)]
            per_call = (float(np.median(thi)) - float(np.median(tlo))) / (HI - LO)
            results[kind] = {
                "per_call_ms": round(per_call, 3),
                "lo_p50_ms": round(float(np.median(tlo)), 2),
                "hi_p50_ms": round(float(np.median(thi)), 2),
            }
        except Exception as e:  # Mosaic int4 operand rejection is an answer
            results[kind] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
    out["results"] = results
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _wait_for_backend

    _wait_for_backend(float(os.environ.get("BENCH_BACKEND_DEADLINE_S", "900")))
    main()
