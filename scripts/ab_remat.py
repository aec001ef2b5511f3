"""On-device A/B: remat policies for the single-chip train step (VERDICT
round 4, item 7). Modes: "full" (save nothing per layer — the round-3
default), "dots" (jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
MXU outputs saved, only elementwise work recomputed), "offload_dots", "none"
(no remat — fits only small models/batches).

Run ONE mode per process: two resident train executables degrade each other
on this backend (docs/performance.md benchmark-hygiene note).

Usage: python scripts/ab_remat.py <mode> [arch=medium] [batch=32]
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
    import optax

    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.train.trainer import make_train_step

    mode = sys.argv[1] if len(sys.argv) > 1 else "dots"
    arch = sys.argv[2] if len(sys.argv) > 2 else "medium"
    tb = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    tt, MAX_FRAMES = 128, 998

    tcfg = get_arch(arch)
    opt = optax.adafactor(1e-4)
    rng = np.random.default_rng(0)
    tparams = unity.unity_init(jax.random.PRNGKey(3), tcfg, dtype=jnp.bfloat16)
    topt = opt.init(tparams)
    batch = {
        "fbank": jnp.asarray(rng.standard_normal((tb, MAX_FRAMES, 80)),
                             jnp.float32),
        "fbank_lens": jnp.full((tb,), MAX_FRAMES, jnp.int32),
        "prev_tokens": jnp.asarray(rng.integers(4, 1000, (tb, tt)), jnp.int32),
        "target_tokens": jnp.asarray(rng.integers(4, 1000, (tb, tt)),
                                     jnp.int32),
        "target_lens": jnp.full((tb,), tt, jnp.int32),
    }
    remat = False if mode == "none" else mode
    tstep = jax.jit(make_train_step(tcfg, opt, remat=remat))
    t0 = time.time()
    tparams, topt, m = tstep(tparams, topt, batch)
    loss0 = float(m["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    n_steps = 3
    for _ in range(n_steps):
        tparams, topt, m = tstep(tparams, topt, batch)
    float(m["loss"])
    dt = (time.time() - t0) / n_steps
    print(json.dumps({
        "metric": "train_step_remat_ab", "mode": mode, "arch": arch,
        "batch": tb, "step_s": round(dt, 3),
        "tokens_per_s": round(tb * tt / dt, 1),
        "loss0": round(loss0, 4), "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _wait_for_backend

    _wait_for_backend(float(os.environ.get("BENCH_BACKEND_DEADLINE_S", "900")))
    main()
