#!/usr/bin/env python
"""A/B microbench for the int8 beam-decode self-attention formulations at the
v2-large production shape (B=5 beams, H=16, Dh=64, T=max_len), looped
N steps inside ONE jit program so the axon tunnel's dispatch latency
amortizes out (single-op microbenches through the tunnel are meaningless —
docs/performance.md "Measuring").

Compares, per step (lower is better):
  classic  — physical beam gather fused with insert+attend
             (fused_decode_self_attention_int8: Pallas kernel on TPU)
  onehot   — lazy row-origin reorder, vectorized one-hot einsums
             (indexed_decode_self_attention_int8 default)
  gather   — lazy row-origin reorder, take_along_axis reference
  pallas   — lazy row-origin reorder, single-program serial kernel (TPU only)

Each variant also carries the surrounding per-step work the formulations
differ on (cache carry / beam_src application), so the delta reflects the
real decode-loop cost, not just the attention call.

Usage:  python scripts/bench_decode_attention.py [--steps 200] [--t 262]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=5)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--t", type=int, default=262)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from seamless_communication_tpu.ops.attention import quantize_kv_rows
    from seamless_communication_tpu.ops.kernels.decode_attention import (
        _indexed_onehot, _indexed_pallas_call, _indexed_reference,
        fused_decode_self_attention_int8,
    )

    B, H, Dh, T = args.b, args.h, args.dh, args.t
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.bfloat16)
    kc = jnp.asarray(rng.integers(-127, 127, (B, H, T, Dh)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 127, (B, H, T, Dh)), jnp.int8)
    ks = jnp.asarray(rng.random((B, H, T)) * 0.05 + 0.01, jnp.float32)
    vs = jnp.asarray(rng.random((B, H, T)) * 0.05 + 0.01, jnp.float32)

    def src_at(step):
        # deterministic pseudo-random beam permutation per step
        return (jnp.arange(B) * 2 + step) % B

    def loop(variant):
        """N decode steps; each consumes the previous output so XLA cannot
        collapse the loop."""
        def body(carry, step):
            q, kcur, vcur, kcc, vcc, kss, vss, row_src = carry
            src = src_at(step)
            if variant == "classic":
                out, kcc, vcc, kss, vss = fused_decode_self_attention_int8(
                    q, kcur, vcur, kcc, vcc, kss, vss, step, src)
            else:
                rs = jnp.take(row_src, src, axis=0)
                rs = jax.lax.dynamic_update_slice(
                    rs, jnp.arange(B, dtype=jnp.int32)[:, None], (0, step))
                fn = {"onehot": _indexed_onehot,
                      "gather": _indexed_reference}.get(variant)
                if fn is not None:
                    out = fn(q, kcur, vcur, kcc, vcc, kss, vss, rs, step)
                else:  # pallas
                    out = _indexed_pallas_call(
                        q, kcur, vcur, kcc, vcc, kss, vss,
                        jnp.asarray(rs, jnp.int32),
                        jnp.reshape(jnp.asarray(step, jnp.int32), (1,)))
                # lazy: the only cache write — this beam's own new row at
                # [b, :, step], exactly as _decoder_step_per_layer does
                kq, kscale = quantize_kv_rows(kcur)
                vq, vscale = quantize_kv_rows(vcur)
                kcc = jax.lax.dynamic_update_slice(
                    kcc, kq[:, :, None, :], (0, 0, step, 0))
                vcc = jax.lax.dynamic_update_slice(
                    vcc, vq[:, :, None, :], (0, 0, step, 0))
                kss = jax.lax.dynamic_update_slice(
                    kss, kscale[:, :, None], (0, 0, step))
                vss = jax.lax.dynamic_update_slice(
                    vss, vscale[:, :, None], (0, 0, step))
                row_src = rs
            # next q/k/v derive from out
            nxt = out.astype(jnp.bfloat16)
            return (nxt, nxt, nxt, kcc, vcc, kss, vss, row_src), ()

        ident = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                                 (B, T))
        init = (q0, q0, q0, kc, vc, ks, vs, ident)
        (out, *_), _ = jax.lax.scan(body, init, jnp.arange(args.steps))
        return out

    results = {}
    variants = ["classic", "onehot", "gather"]
    if jax.default_backend() == "tpu":
        variants.append("pallas")
    for v in variants:
        f = jax.jit(lambda v=v: loop(v))
        t0 = time.time()
        np.asarray(f())  # compile + first run
        compile_s = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            np.asarray(f())
            times.append(time.time() - t0)
        ms = float(np.median(times)) * 1000 / args.steps
        results[v] = ms
        print(f"{v:8s}  {ms:7.4f} ms/step   (compile {compile_s:.1f}s, "
              f"median of {args.reps})", flush=True)

    best = min(results, key=results.get)
    print(f"best: {best} ({results[best]:.4f} ms/step)")


if __name__ == "__main__":
    main()
