"""Golden regression anchors — this framework's counterpart of the reference's
golden-output integration tests (tests/integration/inference/test_translator.py
exact German sentences; test_conformer_shaw.py mean/std anchors).

With no checkpoints reachable here, the anchors freeze DETERMINISTIC tiny-model
statistics (fixed PRNG seeds + fixed inputs). Any numerical drift introduced by
later refactors trips these. Regenerate intentionally with:
    python -m tests.integration.test_golden_regression
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN_PATH = Path(__file__).parent / "golden_tiny.json"


def _compute_anchors() -> dict:
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.audio.fbank import fbank_numpy

    anchors = {}

    # fbank statistics on a fixed chirp
    t = np.arange(16000) / 16000.0
    sig = np.sin(2 * np.pi * (200 + 400 * t) * t).astype(np.float32)
    fb = fbank_numpy(sig)
    anchors["fbank_mean"] = float(fb.mean())
    anchors["fbank_std"] = float(fb.std())

    # speech encoder output stats (tiny_v2, seed 0) — conformer_shaw-style anchor
    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    fb_in = jnp.asarray(np.tile(fb[None, :96], (1, 1, 1)), jnp.float32)
    enc = unity.encode_speech(params, cfg, fb_in, jnp.array([96]))
    anchors["enc_mean"] = float(np.asarray(enc.seqs).mean())
    anchors["enc_std"] = float(np.asarray(enc.seqs).std())
    anchors["enc_len"] = int(enc.lengths[0])

    # text decoder logits stats
    ids = jnp.asarray([[3, 5, 7, 9, 11, 3]], jnp.int32)
    feats = unity.decode_text(params, cfg, ids, enc,
                              self_lengths=jnp.array([6]))
    logits = unity.project(params, feats)
    anchors["dec_logit_mean"] = float(np.asarray(logits).mean())
    anchors["dec_argmax_sum"] = int(np.asarray(jnp.argmax(logits, -1)).sum())

    # NAR T2U determinism: duration + unit-argmax checksum
    from seamless_communication_tpu.models.unity.t2u import nar_t2u_forward
    char_ids = jnp.asarray([[4, 5, 6, 7, 8, 9, 10, 11]], jnp.int32)
    char_counts = jnp.asarray([[0, 0, 2, 2, 2, 2]], jnp.int32)
    out = nar_t2u_forward(params["t2u"], cfg.nar_t2u, feats, jnp.array([6]),
                          char_ids, char_counts, max_unit_len=64)
    anchors["t2u_unit_len"] = int(out.unit_lengths[0])
    anchors["t2u_dur_sum"] = int(np.asarray(out.durations).sum())
    anchors["t2u_argmax_sum"] = int(np.asarray(
        jnp.argmax(out.unit_logits, -1)).sum())
    return anchors


def test_golden_anchors():
    if not GOLDEN_PATH.exists():
        pytest.skip("golden file missing; run module as __main__ to generate")
    golden = json.loads(GOLDEN_PATH.read_text())
    got = _compute_anchors()
    for key, val in golden.items():
        if isinstance(val, int):
            assert got[key] == val, f"{key}: {got[key]} != {val}"
        else:
            assert got[key] == pytest.approx(val, rel=2e-3, abs=2e-4), \
                f"{key}: {got[key]} != {val}"


if __name__ == "__main__":
    anchors = _compute_anchors()
    GOLDEN_PATH.write_text(json.dumps(anchors, indent=2))
    print("wrote", GOLDEN_PATH)
    print(json.dumps(anchors, indent=2))
