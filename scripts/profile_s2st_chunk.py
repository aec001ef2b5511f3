"""Per-agent wall-time breakdown of the streaming S2ST chunk (the bench's
``stream_s2st_ms_per_chunk`` config): which agent eats the 320 ms budget.

Replicates bench.py's stream-S2ST block — streaming arch encoder + dense_1b
EMMA (tiny planted vocab, threshold 0: a write burst EVERY chunk) + NAR T2U +
code HiFi-GAN — and times each agent's pop() per warm run.

Usage (holds the TPU chip; one process only):
    python scripts/profile_s2st_chunk.py [int8|bf16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    mono_int8 = (sys.argv[1] if len(sys.argv) > 1 else "int8") == "int8"

    from seamless_communication_tpu.models.monotonic.model import (
        MonotonicDecoderConfig, monotonic_decoder_init,
    )
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
    from seamless_communication_tpu.models.vocoder.codehifigan import (
        CodeHifiGanConfig, code_hifigan_init,
    )
    from seamless_communication_tpu.streaming.pipeline import (
        StreamingSession, build_s2st_pipeline,
    )
    from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
    from seamless_communication_tpu.text.nllb import NllbTokenizer
    from seamless_communication_tpu.text.spm import (
        SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL,
        TYPE_UNKNOWN,
    )

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    words = ["▁the", "▁a", "▁и", ".", ","] + ["▁"] + list("abcdef")
    tok = NllbTokenizer(SentencePieceModel.from_bytes(build_spm_model(
        base + [(w, -2.0, TYPE_NORMAL) for w in words])), langs=["__eng__"])
    scfg = get_arch("streaming")
    t0 = time.time()
    sparams = unity.unity_init(jax.random.PRNGKey(4), scfg, dtype=dtype)
    mono_cfg = MonotonicDecoderConfig()
    mono_cfg_small = mono_cfg._replace(vocab_size=len(tok.spm) + 1 + 1)
    mono_params_small = monotonic_decoder_init(jax.random.PRNGKey(6),
                                               mono_cfg_small, dtype=dtype)
    emb = np.zeros((mono_cfg_small.vocab_size, mono_cfg.model_dim), np.float32)
    u = np.asarray(rng.standard_normal(mono_cfg.model_dim), np.float32)
    emb[4], emb[5] = u, -u
    mono_params_small["embed"]["embedding"] = jnp.asarray(emb, dtype)
    voc_cfg = CodeHifiGanConfig()
    voc_params = code_hifigan_init(jax.random.PRNGKey(1), voc_cfg, dtype=dtype)
    jax.block_until_ready(voc_params)
    print(f"# init {time.time()-t0:.1f}s", flush=True)

    word_chars = sorted({c for w in words for c in w})
    char_tok_s = CharTokenizer(SentencePieceModel.from_bytes(build_spm_model(
        base + [(c, -1.0, TYPE_NORMAL) for c in word_chars])))
    unit_tok_s = UnitTokenizer(10000, ["eng"], "base_v2")
    pipe = build_s2st_pipeline(
        sparams, scfg, mono_params_small, mono_cfg_small, tok, unit_tok_s,
        char_tok_s, voc_params, voc_cfg,
        {"multilingual": {"eng": 0}, "multispkr": {"eng": [0]}},
        tgt_lang="eng", decision_threshold=0.0, min_unit_chunk_size=10,
        mono_quantize_int8=mono_int8)
    print(f"# mono weights: {'int8' if mono_int8 else 'bf16'}", flush=True)

    stats: dict = {}
    calls: dict = {}
    for agent in pipe.agents:
        name = type(agent).__name__
        orig = agent.pop

        def timed(orig=orig, name=name):
            t0 = time.time()
            r = orig()
            dt = time.time() - t0
            stats[name] = stats.get(name, 0.0) + dt
            calls[name] = calls.get(name, 0) + 1
            return r

        agent.pop = timed

    swav = np.asarray(rng.standard_normal(160000), np.float32) * 0.1
    n_chunks = -(-len(swav) // int(0.320 * 16000))

    def run_once(label: str):
        stats.clear()
        calls.clear()
        t0 = time.time()
        n_wav = 0
        for _, seg in StreamingSession(pipe, segment_size_ms=320,
                                       tgt_lang="eng").run(swav):
            if getattr(seg, "sample_rate", None) and seg.content is not None:
                n_wav += np.asarray(seg.content).size
        wall = time.time() - t0
        print(f"{label}: wall {wall:.2f}s = {wall/n_chunks*1000:.1f} ms/chunk, "
              f"out {n_wav/16000.0:.2f}s", flush=True)
        for name in stats:
            print(f"  {name:45s} {stats[name]*1000:8.1f} ms total "
                  f"({calls[name]} calls, {stats[name]/calls[name]*1000:6.1f} "
                  f"ms/call)", flush=True)

    run_once("cold")
    run_once("warm1")
    run_once("warm2")


if __name__ == "__main__":
    main()
