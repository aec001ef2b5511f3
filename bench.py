"""Benchmark: end-to-end S2ST real-time factor on SeamlessM4T v2-large shapes,
single TPU chip (driver north star: RTF < 0.1 per v5e chip, BASELINE.json).

Pipeline timed: fbank -> conformer-24 speech encoder + adaptor -> beam-5 text decode
(compiled lax.while_loop) -> host char frontend (the real NAR preprocessing pass,
text/char_frontend.py) -> NAR T2U -> unit HiFi-GAN vocoder. Random bf16 weights
(no public checkpoints reachable from this environment); compute is identical to the
real model, and beam search runs to a WORST-CASE fixed step count so the measured
RTF is an upper bound.

The pipeline compiles as THREE stage executables (encoder / beam decode /
NAR+vocoder), AOT-lowered from abstract shapes and compiled in parallel threads:
cold-start wall is max(stage compiles), not the 6-minute single-program compile
the fused graph cost on the remote XLA service (docs/performance.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time
from typing import Optional

import numpy as np


def main() -> None:
    import os
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.t2u import nar_t2u_forward
    from seamless_communication_tpu.models.vocoder.codehifigan import (
        CodeHifiGanConfig, code_hifigan_forward, code_hifigan_init,
    )
    from seamless_communication_tpu.ops.beam_search import BeamSearchOptions, beam_search
    from seamless_communication_tpu.audio.fbank import fbank_jax
    from seamless_communication_tpu.text.char_frontend import text_to_char_seqs
    from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
    from seamless_communication_tpu.text.nllb import NllbTokenizer
    from seamless_communication_tpu.text.spm import (
        SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL,
        TYPE_UNKNOWN,
    )

    AUDIO_SECONDS = 10.0
    SAMPLE_RATE = 16000
    MAX_FRAMES = 998           # 10 s at 10 ms hop
    # Reference decode cap: max_len = min(1*S_enc + 200, 1024) with S_enc the
    # encoder output length (998 fbank frames -> /2 frontend stack -> /8
    # adaptor = 62), reference inference/generator.py:59-84. min_len pins the
    # beam to run EVERY step, so this is a true worst case at reference
    # termination semantics.
    S_ENC = MAX_FRAMES // 2 // 8
    TEXT_MAX_LEN = min(S_ENC + 200, 1024)   # 262
    MAX_UNIT_LEN = 640
    MAX_CHAR_LEN = 1472        # bucket(262 tokens x ~5.5 chars/piece, synthetic vocab)
    BEAM = 5

    cfg = get_arch("base_v2")
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    # int8 weight-only is the default serving mode (quantization error bounded in
    # tests/unit/test_quantization.py); BENCH_BF16=1 benches the fp path and
    # BENCH_W4=1 the opt-in group-int4 weights (halved HBM weight reads,
    # lossier — see ops/quantization.py)
    quantized = not os.environ.get("BENCH_BF16")
    w_bits = 4 if os.environ.get("BENCH_W4") else 8

    # weight init is benched separately from compile: it is bench-only overhead
    # (real serving loads converted checkpoints), dominated by per-leaf RPC
    # dispatch through the axon tunnel. It OVERLAPS with compilation below:
    # lowering only needs abstract shapes (jax.eval_shape of the init), so the
    # stage compiles run on the XLA service while the device fills weights.
    voc_cfg = CodeHifiGanConfig()

    def init_all():
        params = unity.unity_init(key, cfg, dtype=dtype)
        if quantized:
            from seamless_communication_tpu.ops.quantization import (
                quantize_params,
            )
            params = quantize_params(params, bits=w_bits)
        voc_params = code_hifigan_init(jax.random.PRNGKey(1), voc_cfg,
                                       dtype=dtype)
        return params, voc_params

    params_aval, voc_aval = jax.eval_shape(init_all)
    t_init = time.time()
    init_box = {}

    def run_init():
        p, v = init_all()
        jax.block_until_ready(p)
        jax.block_until_ready(v)
        init_box["params"], init_box["voc"] = p, v
        init_box["s"] = time.time() - t_init

    # host char-frontend fixtures: a realistic synthetic piece vocabulary so the
    # timed path runs the REAL text->char host pass (text/char_frontend.py),
    # not a stand-in (reference nar_decoder_frontend.py:158-259)
    rng = np.random.default_rng(0)
    letters = "abcdefghijklmnopqrstuvwxyz"
    pieces = sorted({"▁" + "".join(rng.choice(list(letters),
                                                   rng.integers(2, 9)))
                     for _ in range(1200)} | {".", ",", "▁the", "▁a"})
    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    text_tok = NllbTokenizer(SentencePieceModel.from_bytes(build_spm_model(
        base + [(p, -2.0, TYPE_NORMAL) for p in pieces])), langs=["__eng__"])
    char_tok = CharTokenizer(SentencePieceModel.from_bytes(build_spm_model(
        base + [(c, -1.0, TYPE_NORMAL) for c in ["▁"] + list(letters)])))
    n_pieces = len(pieces)

    kv_int8 = not os.environ.get("BENCH_KV_BF16")
    wav = jnp.asarray(rng.standard_normal(int(AUDIO_SECONDS * SAMPLE_RATE)),
                      jnp.float32)

    K = BEAM
    V = cfg.nllb.vocab_size

    # ---- three stage programs (compiled in parallel from abstract shapes) ----
    def stage_enc(params, wav):
        fbank = fbank_jax(wav, max_frames=MAX_FRAMES).astype(dtype)[None]
        flens = jnp.array([MAX_FRAMES], jnp.int32)
        return unity.encode_speech(params, cfg, fbank, flens)

    def stage_beam(params, enc, prefix):
        enc_bk = unity.EncoderOutput(jnp.repeat(enc.seqs, K, axis=0),
                                     jnp.repeat(enc.lengths, K, axis=0))
        step_fn, cache_fn = unity.make_text_decode_step(params, cfg, enc_bk)
        opts = BeamSearchOptions(beam_size=K, max_len=TEXT_MAX_LEN,
                                 min_len=TEXT_MAX_LEN - 8,
                                 pad_idx=0, unk_idx=1, eos_idx=3)
        res = beam_search(step_fn, cache_fn(TEXT_MAX_LEN, kv_int8), prefix,
                          jnp.array([2], jnp.int32), opts, V, src_to_step=True)
        return res.tokens[:, 0], res.lengths[:, 0]

    def stage_nar_voc(params, voc_params, tokens, tok_lens, enc,
                      char_ids, char_counts):
        feats = unity.decode_text(params, cfg, tokens, enc, self_lengths=tok_lens)
        out = nar_t2u_forward(params["t2u"], cfg.nar_t2u, feats, tok_lens,
                              char_ids, char_counts, max_unit_len=MAX_UNIT_LEN)
        units = jnp.argmax(out.unit_logits, axis=-1)
        voc = code_hifigan_forward(voc_params, voc_cfg, units, out.unit_lengths,
                                   jnp.array([0]), jnp.array([0]),
                                   dur_prediction=False, max_unit_len=MAX_UNIT_LEN)
        return voc.waveform, voc.sample_lengths

    prefix = jnp.array([[3, 5]], jnp.int32)

    t0 = time.time()
    sds = jax.ShapeDtypeStruct
    wav_aval = sds(wav.shape, wav.dtype)
    enc_aval = jax.eval_shape(stage_enc, params_aval, wav_aval)
    tok_aval = (sds((1, TEXT_MAX_LEN), jnp.int32), sds((1,), jnp.int32))
    lowered = {
        "enc": jax.jit(stage_enc).lower(params_aval, wav_aval),
        "beam": jax.jit(stage_beam).lower(params_aval, enc_aval, prefix),
        "nar_voc": jax.jit(stage_nar_voc).lower(
            params_aval, voc_aval, *tok_aval, enc_aval,
            sds((1, MAX_CHAR_LEN), jnp.int32),
            sds((1, TEXT_MAX_LEN), jnp.int32)),
    }
    if os.environ.get("BENCH_VERBOSE"):
        print(f"# lowered at {time.time()-t0:.1f}s", flush=True)
    with ThreadPoolExecutor(4) as ex:
        init_f = ex.submit(run_init)
        futures = [(k, ex.submit(l.compile)) for k, l in lowered.items()]
        compiled = {k: f.result() for k, f in futures}
        compile_s = time.time() - t0
        init_f.result()
    params, voc_params = init_box["params"], init_box["voc"]
    init_s = init_box["s"]
    if os.environ.get("BENCH_VERBOSE"):
        print(f"# compiled {compile_s:.1f}s, init {init_s:.1f}s (overlapped)",
              flush=True)

    def run_once():
        enc = compiled["enc"](params, wav)
        tokens, tok_lens = compiled["beam"](params, enc, prefix)
        # host round-trip + the real char-frontend pass, exactly as
        # Translator.predict does between pass 1 and pass 2
        tok_np = np.asarray(tokens)
        mapped = np.where(tok_np >= 4, 4 + (tok_np % n_pieces), tok_np)
        char_ids, _, char_counts = text_to_char_seqs(
            text_tok, char_tok, mapped.astype(np.int32),
            max_char_len=MAX_CHAR_LEN)
        out = compiled["nar_voc"](params, voc_params, tokens, tok_lens, enc,
                                  jnp.asarray(char_ids), jnp.asarray(char_counts))
        # device_get forces full execution + transfer (block_until_ready alone does
        # not synchronize reliably through the axon remote tunnel)
        return float(np.asarray(out[0][:, :8]).sum()), int(np.asarray(out[1])[0])

    # warmup: the remote axon service loads each executable onto the chip at
    # first launch — measured separately so compile_s reflects XLA compilation.
    # The three first-launches run CONCURRENTLY on dummy inputs so their
    # server-side load/link times overlap.
    t0 = time.time()
    zeros = lambda aval: jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype), aval)
    enc_z = zeros(enc_aval)
    tok_z, len_z = zeros(tok_aval[0]), zeros(tok_aval[1])
    with ThreadPoolExecutor(3) as ex:
        fs = [ex.submit(compiled["enc"], params, wav),
              ex.submit(compiled["beam"], params, enc_z, prefix),
              ex.submit(compiled["nar_voc"], params, voc_params, tok_z, len_z,
                        enc_z, jnp.zeros((1, MAX_CHAR_LEN), jnp.int32),
                        jnp.zeros((1, TEXT_MAX_LEN), jnp.int32))]
        for f in fs:
            jax.block_until_ready(f.result())
    chk, n_samples = run_once()
    warmup_s = time.time() - t0
    if os.environ.get("BENCH_VERBOSE"):
        print(f"# warmup {warmup_s:.1f}s", flush=True)

    times = []
    for _ in range(3):
        t0 = time.time()
        run_once()
        times.append(time.time() - t0)

    rtf = float(np.median(times)) / AUDIO_SECONDS
    extra = {"compile_s": round(compile_s, 1),
             "init_s": round(init_s, 1),
             "warmup_s": round(warmup_s, 1),
             "p50_ms": round(float(np.median(times)) * 1000, 1),
             "decode_cap": f"reference min(S+200,1024)={TEXT_MAX_LEN} steps, "
                           "min_len forces all steps",
             "char_frontend": "real host pass (text/char_frontend.py) in timed path",
             "weights": (f"int{w_bits}" if quantized else "bf16"),
             "kv_cache": "int8" if kv_int8 else "bf16",
             "platform": str(jax.devices()[0]).strip()}

    # ---- secondary sections (VERDICT r03 item 2: the scored artifact must
    # carry the round's numbers, not docs prose). Default ON; BENCH_FAST=1
    # runs only the core metric, BENCH_SKIP=csv skips named sections, and a
    # wall budget (BENCH_BUDGET_S, default 2100 s) stops adding sections when
    # exceeded so the driver's bench never times out half-way.
    bench_t0 = time.time()
    _skip = {s for s in os.environ.get("BENCH_SKIP", "").split(",") if s}

    def section(name: str, legacy_env: Optional[str] = None) -> bool:
        if os.environ.get(legacy_env or f"BENCH_{name.upper()}"):
            return True         # legacy opt-in forces the section on
        if os.environ.get("BENCH_FAST") or name in _skip:
            return False
        budget = float(os.environ.get("BENCH_BUDGET_S", "2100"))
        if time.time() - bench_t0 > budget:
            extra.setdefault("sections_skipped_budget", []).append(name)
            return False
        return True

    import contextlib

    @contextlib.contextmanager
    def _section_guard(name: str):
        """A failing secondary section records its error in ``extra`` instead
        of voiding the whole scored artifact (the core metric has already been
        measured when the sections run)."""
        try:
            yield
        except Exception as e:  # noqa: BLE001
            extra[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:300]}"

    # batch-8 S2TT throughput (BASELINE.json config 2)
    if section("full"):
      with _section_guard("full"):
            B8 = 8
            fb8 = jnp.asarray(rng.standard_normal((B8, MAX_FRAMES, 80)), dtype)
            fl8 = jnp.full((B8,), MAX_FRAMES, jnp.int32)
            prefix8 = jnp.tile(prefix, (B8, 1))

            def s2tt(params, fb, fl, prefix):
                enc = unity.encode_speech(params, cfg, fb, fl)
                enc_bk = unity.EncoderOutput(jnp.repeat(enc.seqs, K, axis=0),
                                             jnp.repeat(enc.lengths, K, axis=0))
                step_fn, cache_fn = unity.make_text_decode_step(params, cfg, enc_bk)
                opts = BeamSearchOptions(beam_size=K, max_len=TEXT_MAX_LEN,
                                         min_len=TEXT_MAX_LEN - 8, pad_idx=0,
                                         unk_idx=1, eos_idx=3)
                res = beam_search(step_fn, cache_fn(TEXT_MAX_LEN, True), prefix,
                                  jnp.full((B8,), 2, jnp.int32), opts, V,
                                  src_to_step=True)
                return res.tokens

            s2tt_fn = jax.jit(s2tt)
            _ = np.asarray(s2tt_fn(params, fb8, fl8, prefix8))[:1]
            t0 = time.time()
            _ = np.asarray(s2tt_fn(params, fb8, fl8, prefix8))[:1]
            s2tt_rtf = (time.time() - t0) / (B8 * AUDIO_SECONDS)
            extra["s2tt_batch8_rtf"] = round(s2tt_rtf, 5)
            extra["s2tt_batch8_audio_s_per_s"] = round(1.0 / s2tt_rtf, 1)

    # int4 weight + int4 KV decode, MEASURED end-to-end (VERDICT r04 item 3:
    # replace the derived int4_est_rtf with a full-pipeline run on int4).
    # int4 AT REST: device_put of S4 arrays recurses on this backend, but
    # materializing the quantized tree as the OUTPUT of a jitted
    # quantize_params avoids device_put entirely — the int4 weights then live
    # on-device across calls like any other array.
    if section("int4", "BENCH_INT4"):
      with _section_guard("int4"):
            import gc

            from seamless_communication_tpu.ops.quantization import (
                quantize_params,
            )
            bf16 = unity.unity_init(jax.random.PRNGKey(0), cfg, dtype=dtype)
            jax.block_until_ready(bf16)
            try:
                params_i4 = jax.jit(
                    lambda p: quantize_params(p, bits=4, int4_group=0))(bf16)
                jax.block_until_ready(params_i4)
                at_rest = True
            except Exception as e:  # S4 relayout regression: fall back
                extra["int4_at_rest_error"] = f"{type(e).__name__}: {str(e)[:120]}"
                params_i4, at_rest = None, False
            del bf16
            gc.collect()

            def stage_beam4(params, enc, prefix):
                # int4 weights + packed-int4 KV cache through the Pallas
                # decode kernel (ops/kernels/decode_attention.py _kernel_int4)
                enc_bk = unity.EncoderOutput(jnp.repeat(enc.seqs, K, axis=0),
                                             jnp.repeat(enc.lengths, K, axis=0))
                step_fn, cache_fn = unity.make_text_decode_step(params, cfg,
                                                                enc_bk)
                opts = BeamSearchOptions(beam_size=K, max_len=TEXT_MAX_LEN,
                                         min_len=TEXT_MAX_LEN - 8,
                                         pad_idx=0, unk_idx=1, eos_idx=3)
                res = beam_search(step_fn,
                                  cache_fn(TEXT_MAX_LEN, True, kv_bits=4),
                                  prefix, jnp.array([2], jnp.int32), opts, V,
                                  src_to_step=True)
                return res.tokens[:, 0], res.lengths[:, 0]

            if at_rest:
                enc4_fn = jax.jit(stage_enc)
                beam4_fn = jax.jit(stage_beam4)
                nar4_fn = jax.jit(stage_nar_voc)

                def run_once_i4():
                    enc = enc4_fn(params_i4, wav)
                    tokens, tok_lens = beam4_fn(params_i4, enc, prefix)
                    tok_np = np.asarray(tokens)
                    mapped = np.where(tok_np >= 4, 4 + (tok_np % n_pieces),
                                      tok_np)
                    char_ids, _, char_counts = text_to_char_seqs(
                        text_tok, char_tok, mapped.astype(np.int32),
                        max_char_len=MAX_CHAR_LEN)
                    out = nar4_fn(params_i4, voc_params, tokens, tok_lens,
                                  enc, jnp.asarray(char_ids),
                                  jnp.asarray(char_counts))
                    np.asarray(out[0][:, :8])
                    return None

                run_once_i4()                 # compile + first launch
                t_i4e = []
                for _ in range(3):
                    t0 = time.time()
                    run_once_i4()
                    t_i4e.append(time.time() - t0)
                extra["int4_rtf"] = round(
                    float(np.median(t_i4e)) / AUDIO_SECONDS, 5)

                enc1 = enc4_fn(params_i4, wav)

                def run_beam4():
                    t0 = time.time()
                    toks, _ = beam4_fn(params_i4, enc1, prefix)
                    np.asarray(toks)
                    return (time.time() - t0) * 1000.0

                run_beam4()
                t_i4 = [run_beam4() for _ in range(3)]
                extra["int4_beam_p50_ms"] = round(float(np.median(t_i4)), 1)
                extra["int4_ms_per_step"] = round(
                    float(np.median(t_i4)) / TEXT_MAX_LEN, 3)
                extra["int4_kv"] = "packed int4 (Pallas kernel)"
                del params_i4, enc4_fn, beam4_fn, nar4_fn, enc1
                gc.collect()
                jax.clear_caches()

    # opt-in medium-model ASR RTF (BASELINE.json config 1: seamlessM4T_medium
    # ASR on a single 10 s clip): w2v-BERT 300m XL-attention encoder + NLLB
    # dense_600m beam-5 decode at the same reference cap
    if section("asr"):
      with _section_guard("asr"):
            mcfg = get_arch(os.environ.get("BENCH_ASR_ARCH", "medium"))
            mparams = unity.unity_init(jax.random.PRNGKey(7), mcfg, dtype=dtype)
            if quantized:
                from seamless_communication_tpu.ops.quantization import (
                    quantize_params,
                )
                mparams = quantize_params(mparams)

            def asr(params, wav, prefix):
                fbank = fbank_jax(wav, max_frames=MAX_FRAMES).astype(dtype)[None]
                flens = jnp.array([MAX_FRAMES], jnp.int32)
                enc = unity.encode_speech(params, mcfg, fbank, flens)
                enc_bk = unity.EncoderOutput(jnp.repeat(enc.seqs, K, axis=0),
                                             jnp.repeat(enc.lengths, K, axis=0))
                step_fn, cache_fn = unity.make_text_decode_step(params, mcfg,
                                                                enc_bk)
                opts = BeamSearchOptions(beam_size=K, max_len=TEXT_MAX_LEN,
                                         min_len=TEXT_MAX_LEN - 8, pad_idx=0,
                                         unk_idx=1, eos_idx=3)
                res = beam_search(step_fn, cache_fn(TEXT_MAX_LEN, kv_int8),
                                  prefix, jnp.array([2], jnp.int32), opts,
                                  mcfg.nllb.vocab_size, src_to_step=True)
                return res.tokens[:, 0]

            asr_fn = jax.jit(asr)
            _ = np.asarray(asr_fn(mparams, wav, prefix))
            times_asr = []
            for _ in range(3):
                t0 = time.time()
                _ = np.asarray(asr_fn(mparams, wav, prefix))
                times_asr.append(time.time() - t0)
            asr_rtf = float(np.median(times_asr)) / AUDIO_SECONDS
            extra["asr_medium_rtf"] = round(asr_rtf, 5)
            extra["asr_medium_p50_ms"] = round(float(np.median(times_asr)) * 1e3, 1)
            del mparams

    # opt-in expressive-synthesis RTF (BASELINE.json config 4): PRETSSEL
    # 16 kHz production config, 640 units / ~12.8 s of speech
    if section("expressive"):
      with _section_guard("expressive"):
            from seamless_communication_tpu.models.pretssel.vocoder import (
                PretsselConfig, pretssel_forward, pretssel_init,
            )
            pcfg = PretsselConfig()
            pparams = pretssel_init(jax.random.PRNGKey(2), pcfg, dtype=dtype)
            U, MEL = 640, 1600
            units = jnp.asarray(rng.integers(4, 10000, (1, U)), jnp.int32)
            durs = jnp.full((1, U), 2, jnp.int32)
            pros = jnp.asarray(rng.standard_normal((1, MAX_FRAMES, 80)), dtype)

            def expressive(pparams, units, durs, pros):
                out = pretssel_forward(pparams, pcfg, units, jnp.array([U]), durs,
                                       pros, jnp.array([MAX_FRAMES]),
                                       jnp.array([0]), max_mel_len=MEL)
                return out.waveform, out.sample_lengths

            efn = jax.jit(expressive)
            wave, wl = efn(pparams, units, durs, pros)
            n = int(np.asarray(wl)[0])
            t0 = time.time()
            wave, wl = efn(pparams, units, durs, pros)
            np.asarray(wave[:, :8])
            seconds_out = n / 16000.0
            extra["expressive_synth_rtf"] = round((time.time() - t0) / seconds_out, 5)
            extra["expressive_synth_audio_s"] = round(seconds_out, 2)

    def _stream_section():
        # nested so the dense_1b EMMA params, pipelines and their
        # executables are freed when the section returns: the train
        # section below needs the full HBM budget (r04: leaking these
        # from the main frame OOMed the train step).
        from seamless_communication_tpu.models.monotonic.model import (
            MonotonicDecoderConfig, monotonic_decoder_init,
        )
        from seamless_communication_tpu.streaming.pipeline import (
            StreamingSession, build_s2t_pipeline,
        )
        from seamless_communication_tpu.text.nllb import NllbTokenizer
        from seamless_communication_tpu.text.spm import (
            SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL,
            TYPE_UNKNOWN,
        )

        base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
                ("</s>", 0.0, TYPE_CONTROL)]
        words = ["▁the", "▁a", "▁и", ".", ","] + ["▁"] + list("abcdef")
        tok = NllbTokenizer(SentencePieceModel.from_bytes(build_spm_model(
            base + [(w, -2.0, TYPE_NORMAL) for w in words])), langs=["__eng__"])
        scfg = get_arch("streaming")
        sparams = unity.unity_init(jax.random.PRNGKey(4), scfg, dtype=dtype)
        mono_cfg = MonotonicDecoderConfig()
        mono_params = monotonic_decoder_init(jax.random.PRNGKey(5), mono_cfg,
                                             dtype=dtype)
        swav = np.asarray(rng.standard_normal(160000), np.float32) * 0.1

        pipe = build_s2t_pipeline(sparams, scfg, mono_params, mono_cfg,
                                  tok, tgt_lang="eng")
        n_chunks = -(-len(swav) // int(0.320 * 16000))

        def stream_once():
            t0 = time.time()
            # StreamingSession resets the (reused) pipeline; executables stay
            for _ in StreamingSession(pipe, segment_size_ms=320,
                                      tgt_lang="eng").run(swav):
                pass
            return time.time() - t0

        stream_once()                    # cold (compiles)
        wall = stream_once()             # warm
        extra["stream_ms_per_chunk"] = round(wall / n_chunks * 1000, 1)
        extra["stream_xrt"] = round(wall / 10.0, 3)

        # ---- full S2ST streaming chunk (VERDICT r03 item 4): EMMA chunk +
        # NAR T2U re-run + unit-vocoder synth per 320 ms chunk (reference
        # online_unit_decoder.py:94-147 + online_vocoder.py:43-69), timed at
        # the worst case (threshold 0: a write burst EVERY chunk, so every
        # chunk pays the re-decode + synth). Text side uses the full dense_1b
        # EMMA layer stack with a tokenizer-sized planted vocab (real words
        # must flow for the unit branch to fire); unit side is the production
        # NAR T2U + code HiFi-GAN.
        from seamless_communication_tpu.models.unity.unit_tokenizer import (
            UnitTokenizer,
        )
        from seamless_communication_tpu.streaming.pipeline import (
            build_s2st_pipeline,
        )
        from seamless_communication_tpu.text.char_tokenizer import CharTokenizer

        mono_cfg_small = mono_cfg._replace(vocab_size=len(tok.spm) + 1 + 1)
        mono_params_small = monotonic_decoder_init(jax.random.PRNGKey(6),
                                                   mono_cfg_small, dtype=dtype)
        # plant +-u word rows so every burst step emits a real word (argmax of
        # a random 20-vocab head rarely lands on one) — see the AL note below
        emb = np.zeros((mono_cfg_small.vocab_size, mono_cfg.model_dim),
                       np.float32)
        u = np.asarray(rng.standard_normal(mono_cfg.model_dim), np.float32)
        emb[4], emb[5] = u, -u                     # two word pieces
        mono_params_small["embed"]["embedding"] = jnp.asarray(emb, dtype)

        word_chars = sorted({c for w in words for c in w})
        char_tok_s = CharTokenizer(SentencePieceModel.from_bytes(build_spm_model(
            base + [(c, -1.0, TYPE_NORMAL) for c in word_chars])))
        unit_tok_s = UnitTokenizer(10000, ["eng"], "base_v2")
        s2st_pipe = build_s2st_pipeline(
            sparams, scfg, mono_params_small, mono_cfg_small, tok, unit_tok_s,
            char_tok_s, voc_params, voc_cfg,
            {"multilingual": {"eng": 0}, "multispkr": {"eng": [0]}},
            tgt_lang="eng", decision_threshold=0.0, min_unit_chunk_size=10)
        # mono weights stay on the production default (int8 on TPU): the
        # planted ±u word rows live in the "embedding" leaf, which
        # quantize_params never rewrites, so the burst still emits real words

        def s2st_once():
            t0 = time.time()
            n_wav = 0
            for _, seg in StreamingSession(s2st_pipe, segment_size_ms=320,
                                           tgt_lang="eng").run(swav):
                if getattr(seg, "sample_rate", None) and seg.content is not None:
                    n_wav += np.asarray(seg.content).size
            return time.time() - t0, n_wav

        s2st_once()                          # cold (compiles)
        s2st_wall, s2st_nwav = s2st_once()   # warm
        extra["stream_s2st_ms_per_chunk"] = round(
            s2st_wall / n_chunks * 1000, 1)
        extra["stream_s2st_out_audio_s"] = round(s2st_nwav / 16000.0, 2)

        # StartOffset/EndOffset through the evaluator's speech scorer
        # (reference cli/streaming/evaluate.py:91-93) on the warm pipeline —
        # same utterance, so the incremental executables are all hot
        from seamless_communication_tpu.streaming.evaluator import (
            evaluate_streaming as _eval_stream,
        )
        with _section_guard("stream_offsets"):
            off = _eval_stream(lambda: s2st_pipe, [swav], tgt_lang="eng",
                               segment_size_ms=320, output_is_speech=True)
            for k, v in (("stream_s2st_start_offset_ms", off["StartOffset_ms"]),
                         ("stream_s2st_end_offset_ms", off["EndOffset_ms"])):
                if np.isfinite(v):      # NaN would break the one-line JSON
                    extra[k] = round(float(v), 1)

        # ---- expressive streaming chunk (VERDICT r04 item 5): EMMA chunk +
        # NAR units + PRETSSEL mel synth + prosody fbank of the accumulated
        # source EVERY chunk (reference streaming/agents/seamless_s2st.py:35-77,
        # pretssel_vocoder.py) at the worst case (threshold 0: a write burst
        # and a synth every chunk). PRETSSEL is the production 16 kHz config.
        with _section_guard("stream_expressive"):
            from seamless_communication_tpu.models.pretssel.vocoder import (
                PretsselConfig, pretssel_init,
            )
            from seamless_communication_tpu.streaming.pipeline import (
                build_expressive_s2st_pipeline,
            )
            pcfg = PretsselConfig()
            pparams_s = pretssel_init(jax.random.PRNGKey(2), pcfg, dtype=dtype)
            exp_pipe = build_expressive_s2st_pipeline(
                sparams, scfg, mono_params_small, mono_cfg_small, tok,
                unit_tok_s, char_tok_s, pparams_s, pcfg, {"eng": 0},
                np.zeros(80, np.float32), np.ones(80, np.float32),
                tgt_lang="eng", decision_threshold=0.0,
                min_unit_chunk_size=10)

            def exp_once():
                t0 = time.time()
                n_wav = 0
                for _, seg in StreamingSession(exp_pipe, segment_size_ms=320,
                                               tgt_lang="eng").run(swav):
                    if (getattr(seg, "sample_rate", None)
                            and seg.content is not None):
                        n_wav += np.asarray(seg.content).size
                return time.time() - t0, n_wav

            exp_once()                       # cold (compiles)
            ew, en = exp_once()              # warm
            extra["stream_expressive_ms_per_chunk"] = round(
                ew / n_chunks * 1000, 1)
            extra["stream_expressive_out_audio_s"] = round(en / 16000.0, 2)
            del exp_pipe, pparams_s

        # latency metrics through the SAME evaluator the streaming_evaluate
        # CLI uses (AL/LAAL over emitted tokens; reference evaluate.py:70) on
        # a small synthetic set — policy delays are weight-dependent, wall
        # time is not part of AL, so this publishes the metric pipeline plus
        # the policy's latency profile on this config
        from seamless_communication_tpu.streaming.evaluator import (
            evaluate_streaming,
        )
        utts = [np.asarray(rng.standard_normal(int(sec * 16000)),
                           np.float32) * 0.1 for sec in (4.0, 6.5, 10.0)]
        # threshold 0 (structural floor): the planted word-row model (built in
        # the S2ST block above) emits at every opportunity, so AL/LAAL measure
        # the pipeline's structural emission latency (chunk-indexed,
        # wall-clock independent; reference cli/streaming/evaluate.py:70)
        lat_pipe = build_s2t_pipeline(sparams, scfg, mono_params_small,
                                      mono_cfg_small, tok, tgt_lang="eng",
                                      decision_threshold=0.0, min_gen_len=12)
        lat = evaluate_streaming(lambda: lat_pipe, utts, tgt_lang="eng",
                                 segment_size_ms=320)
        extra["stream_AL_ms"] = round(lat["AL_ms"], 1)
        extra["stream_LAAL_ms"] = round(lat["LAAL_ms"], 1)
        del lat_pipe

        # ---- threshold-0.5 policy AL (VERDICT r03 item 10): a STRUCTURED
        # planted model whose p_choose crosses 0.5 mid-utterance. The energy
        # towers are planted so p_choose discriminates source CONTENT: q is a
        # constant all-ones vector (zero weights, one-bias on the last tower
        # layer), the k tower passes the pooled encoder key through (identity
        # + positive-offset layers keep relu affine), and its last layer
        # projects onto the probed silence->speech direction, scaled so
        # silence chunks give p ~ sigmoid(-2.5) < 0.5 (READ) and speech chunks
        # p ~ 1 (WRITE). On a silence-prefixed utterance the policy genuinely
        # WAITS through the silent chunks and starts writing at speech onset,
        # so the scored AL reflects the real threshold-0.5 decision path
        # (models/monotonic/model.py p_choose; decision_method="min").
        from seamless_communication_tpu.audio.fbank import (
            FbankConfig, fbank_numpy,
        )
        from seamless_communication_tpu.models.monotonic.model import pool_keys
        from seamless_communication_tpu.streaming.fused import (
            encoder_output_length,
        )

        sil_s, sp_s = 3.2, 6.4
        utt05 = np.concatenate([
            np.zeros(int(sil_s * 16000), np.float32),
            (rng.standard_normal(int(sp_s * 16000)) * 0.1).astype(np.float32)])
        fb05 = fbank_numpy(utt05, FbankConfig(waveform_scale=1.0))
        enc05 = unity.encode_speech(sparams, scfg,
                                    jnp.asarray(fb05, dtype)[None],
                                    jnp.array([fb05.shape[0]], jnp.int32))
        ratio = mono_cfg.pre_decision_ratio
        pooled = np.asarray(pool_keys(enc05.seqs.astype(jnp.float32),
                                      ratio)[0])
        n_valid = int(enc05.lengths[0]) // ratio
        p_sil = encoder_output_length(scfg.speech,
                                      int(sil_s * 100)) // ratio
        m_sil = pooled[:max(p_sil - 1, 1)].mean(0)
        m_sp = pooled[p_sil + 2:n_valid].mean(0)

        Dm, n_e = mono_cfg.model_dim, mono_cfg.num_monotonic_energy_layers
        L = mono_cfg.num_layers
        OFF = 30.0                       # keeps relu affine: enc dims > -30
        m3_sil, m3_sp = m_sil + OFF * (n_e - 1), m_sp + OFF * (n_e - 1)
        d = m3_sp - m3_sil
        d = d / np.linalg.norm(d)
        # margin +-4 around the class means: a speech chunk stays above the
        # p=0.5 point as long as its d-projection is within half the
        # silence->speech gap of the speech mean
        gamma = 8.0 / float(d @ (m3_sp - m3_sil))
        bcoef = 4.0 - gamma * float(d @ m3_sp)
        zw = jnp.zeros((L, Dm, Dm), dtype)
        zb = jnp.zeros((L, Dm), dtype)
        eye = jnp.broadcast_to(jnp.eye(Dm, dtype=dtype), (L, Dm, Dm))
        offb = jnp.full((L, Dm), OFF, dtype)
        w_last = jnp.broadcast_to(
            jnp.asarray(np.tile((gamma * d)[:, None], (1, Dm)), dtype),
            (L, Dm, Dm))
        q_tower = ([{"weight": zw, "bias": zb} for _ in range(n_e - 1)]
                   + [{"weight": zw, "bias": jnp.ones((L, Dm), dtype)}])
        k_tower = ([{"weight": eye, "bias": offb} for _ in range(n_e - 1)]
                   + [{"weight": w_last,
                       "bias": jnp.full((L, Dm), bcoef, dtype)}])
        mono05 = dict(mono_params_small)
        mono05["layers"] = dict(mono_params_small["layers"])
        mono05["layers"]["p_choose"] = {
            "energy_bias": mono_params_small["layers"]["p_choose"]["energy_bias"],
            "q_energy_proj": q_tower, "k_energy_proj": k_tower}
        lat05_pipe = build_s2t_pipeline(sparams, scfg, mono05, mono_cfg_small,
                                        tok, tgt_lang="eng",
                                        decision_threshold=0.5, min_gen_len=12,
                                        mono_quantize_int8=False)
        lat05 = evaluate_streaming(lambda: lat05_pipe, [utt05],
                                   tgt_lang="eng", segment_size_ms=320)
        extra["stream_AL05_ms"] = round(lat05["AL_ms"], 1)
        extra["stream_LAAL05_ms"] = round(lat05["LAAL_ms"], 1)

        # ---- batched multi-session pool (VERDICT r04 item 1): N concurrent
        # streaming sessions over ONE chip via streaming/multi.py — every
        # 320 ms arrival interval runs a single vmapped chunk program for all
        # slots. Runs LAST in the stream section (its N-slot state is the
        # section's biggest allocation; an OOM here must not void the other
        # stream keys — r05 first run) with the single-session pipelines and
        # their executables freed first. Token equality is pinned in
        # tests/integration/test_streaming_multi.py.
        with _section_guard("stream_pool"):
            import gc

            from seamless_communication_tpu.streaming.multi import (
                BatchedStreamingPool,
            )
            del pipe, s2st_pipe, lat05_pipe, mono05
            gc.collect()
            jax.clear_caches()
            N_SLOTS = int(os.environ.get("BENCH_POOL_SLOTS", "8"))
            # 1024 stacked frames = ~20 s of stream: plenty for 10 s of audio
            # + bounded drain, and half the per-slot encoder-state HBM
            pool = None
            try:
                pool = BatchedStreamingPool(sparams, scfg, mono_params,
                                            mono_cfg, tok, n_slots=N_SLOTS,
                                            max_stream_frames=1024)
                SEG = int(0.320 * 16000)

                def pool_once():
                    t0 = time.time()
                    sids = [pool.open_session(tgt_lang="eng")
                            for _ in range(N_SLOTS)]
                    for i in range(n_chunks):
                        for s in sids:
                            pool.push(s, swav[i * SEG:(i + 1) * SEG],
                                      finished=(i == n_chunks - 1))
                        pool.step()
                        for s in sids:
                            pool.pop(s)
                    d = 0
                    while (not all(pool.session_finished(s) for s in sids)
                           and d < 24):    # bounded drain: state cap 1024
                        pool.step()
                        d += 1
                    w = time.time() - t0
                    for s in sids:
                        pool.close_session(s)
                    return w

                pool_once()              # cold (compiles the vmapped chunk)
                pw = pool_once()         # warm
                extra["stream_pool_slots"] = N_SLOTS
                extra["stream_pool_ms_per_chunk"] = round(
                    pw / n_chunks * 1000, 1)
                extra["stream_pool_audio_s_per_s"] = round(
                    N_SLOTS * 10.0 / pw, 1)
                extra["stream_pool_xrt"] = round(pw / 10.0, 3)
            finally:
                del pool
                gc.collect()
                jax.clear_caches()

    if section("stream"):
        with _section_guard("stream"):
            _stream_section()

    # single-chip training throughput: S2T step with the big-model
    # single-chip recipe — bf16 params, factored optimizer states
    # (adafactor), per-layer activation remat. The recipe fits even v2-large
    # (2.53B params) in one chip's 16 GB: BENCH_TRAIN_ARCH=base_v2
    # BENCH_TRAIN_B=16 measured 2977 tok/s (fp32 + adam would not fit —
    # that is what dp+tp meshes are for)
    if section("train"):
      with _section_guard("train"):
            # free the serving state before allocating train state: the int8
            # v2-large weights, vocoder weights (ALSO referenced by init_box —
            # deleting the locals alone leaks them), stage executables and every
            # jit-cache constant (the train step needs the full HBM budget)
            init_box.clear()
            del params, voc_params, compiled, lowered
            import gc
            import optax
            from seamless_communication_tpu.train.trainer import make_train_step

            gc.collect()
            jax.clear_caches()
            tcfg = get_arch(os.environ.get("BENCH_TRAIN_ARCH", "medium"))
            opt = optax.adafactor(1e-4)
            tb, tt = int(os.environ.get("BENCH_TRAIN_B", "32")), 128

            def _s2t_batch(bcfg, tb):
                return {
                    "fbank": jnp.asarray(rng.standard_normal((tb, MAX_FRAMES, 80)),
                                         jnp.float32),
                    "fbank_lens": jnp.full((tb,), MAX_FRAMES, jnp.int32),
                    "prev_tokens": jnp.asarray(rng.integers(4, 1000, (tb, tt)),
                                               jnp.int32),
                    "target_tokens": jnp.asarray(rng.integers(4, 1000, (tb, tt)),
                                                 jnp.int32),
                    "target_lens": jnp.full((tb,), tt, jnp.int32),
                }

            def _s2s_batch(bcfg, tb):
                # NAR T2U finetune targets (manifest -> aligner durations):
                # 2 chars/token x 2 units/char, uniform — static shapes only
                C, U = 2 * tt, 4 * tt
                b = _s2t_batch(bcfg, tb)
                ucfg = bcfg.nar_t2u
                b.update({
                    "char_ids": jnp.asarray(
                        rng.integers(4, ucfg.char_vocab_size, (tb, C)),
                        jnp.int32),
                    "char_counts": jnp.full((tb, tt), 2, jnp.int32),
                    "target_durations": jnp.full((tb, C), 2, jnp.int32),
                    "target_units": jnp.asarray(
                        rng.integers(4, ucfg.unit_vocab_size, (tb, U)),
                        jnp.int32),
                })
                return b

            def _train_once(bcfg, tb, batch_fn, mode=None, tparams=None):
                from seamless_communication_tpu.train.trainer import (
                    FinetuneMode,
                )
                if tparams is None:
                    tparams = unity.unity_init(jax.random.PRNGKey(3), bcfg,
                                               dtype=jnp.bfloat16)
                topt = opt.init(tparams)
                batch = batch_fn(bcfg, tb)
                tstep = jax.jit(make_train_step(
                    bcfg, opt, remat=remat_mode,
                    mode=FinetuneMode.SPEECH_TO_SPEECH if mode == "s2s"
                    else None))
                tparams, topt, m = tstep(tparams, topt, batch)
                float(m["loss"])
                t0 = time.time()
                n_steps = 3
                for _ in range(n_steps):
                    tparams, topt, m = tstep(tparams, topt, batch)
                float(m["loss"])
                return (time.time() - t0) / n_steps, tparams

            # selective remat measured (scripts/ab_remat.py, one mode per
            # process): full@b32 5263 tok/s = full@b48 5266 (HBM-bound plateau);
            # "dots" (save MXU outputs) OOMs at b24+ and DEGRADES below b-scaled
            # full under memory pressure (b8 5010, b12 4273 — near-capacity HBM
            # spills); offload_dots OOMs. Full layer remat at the largest batch
            # stays the best single-chip config; BENCH_TRAIN_REMAT overrides
            # (full | dots | offload_dots) for re-measurement.
            remat_mode = os.environ.get("BENCH_TRAIN_REMAT", "full")
            # the serving sections above can leave the remote allocator
            # fragmented; degrade the batch rather than abort the whole bench
            while True:
                try:
                    dt, tparams = _train_once(tcfg, tb, _s2t_batch)
                    break
                except Exception as e:  # jaxlib RESOURCE_EXHAUSTED
                    if "RESOURCE_EXHAUSTED" not in str(e):
                        raise
                    gc.collect()
                    jax.clear_caches()
                    if remat_mode == "dots":
                        # saved dot outputs didn't fit: fall back to full layer
                        # remat at the same batch before shrinking the batch
                        remat_mode = "full"
                    elif tb > 8:
                        tb //= 2
                    else:
                        raise
            extra["train_arch"] = os.environ.get("BENCH_TRAIN_ARCH", "medium")
            extra["train_medium_batch"] = tb
            extra["train_medium_step_s"] = round(dt, 3)
            extra["train_medium_tokens_per_s"] = round(tb * tt / dt, 1)
            extra["train_medium_audio_s_per_s"] = round(tb * AUDIO_SECONDS / dt, 2)

            # model-FLOPs accounting -> MFU. 6*N*T matmul model (fwd 2NT + bwd
            # 4NT) per component with ITS token count (encoder runs at the
            # subsampled frame rate, decoder at text positions); remat re-runs
            # the layer forwards once more (+2NT -> 8NT). Attention score/value
            # matmuls (quadratic term) add 12*L*T^2*D per component — included;
            # embedding gather excluded. Peak: TPU v5e bf16 = 197 TFLOP/s.
            def _n(tree):
                return sum(x.size for x in jax.tree.leaves(tree))

            # full remat re-runs every layer forward in the backward (+2NT ->
            # 8NT); "dots" saves the matmul outputs so the recompute adds no
            # matmul FLOPs (6NT + elementwise)
            fwd_bwd = 8.0 if remat_mode == "full" else 6.0
            extra["train_remat"] = remat_mode
            T_enc = MAX_FRAMES // 2                       # frontend stack /2

            def _model_flops(bcfg, tp, b, step_s):
                se, td = tp["speech_encoder"], tp["text_decoder"]
                enc_flops = fwd_bwd * _n(se) * b * T_enc
                dec_flops = fwd_bwd * _n(td) * b * tt     # incl. tied vocab proj
                sp = bcfg.speech
                attn = 12.0 * b * (sp.conformer.num_layers * T_enc ** 2
                                   * sp.model_dim
                                   + bcfg.nllb.num_decoder_layers * tt ** 2
                                   * bcfg.nllb.dim)
                total = enc_flops + dec_flops + attn
                return round(total / 1e12, 2), round(total / step_s / 197e12
                                                     * 100, 1)

            tflops, mfu = _model_flops(tcfg, tparams, tb, dt)
            extra["train_medium_model_tflops"] = tflops
            extra["train_medium_mfu_pct"] = mfu

    # v2-large (2.3B) single-chip training + the NAR T2U (S2S) finetune step
    # (VERDICT r04 item 4): same recipe (bf16 + adafactor + full remat). The
    # S2S step — manifest -> aligner-duration targets, the capability the
    # reference trainer lacks (cli/m4t/finetune/trainer.py raises
    # NotImplementedError for T2U) — reuses the v2-large params.
    if section("train_v2large"):
      with _section_guard("train_v2large"):
            import gc
            try:
                del tparams
            except NameError:  # the medium train section itself failed
                pass
            gc.collect()
            jax.clear_caches()
            tcfg_l = get_arch("base_v2")
            tb_l = int(os.environ.get("BENCH_TRAIN_B_LARGE", "16"))
            while True:
                try:
                    dt_l, tparams_l = _train_once(tcfg_l, tb_l, _s2t_batch)
                    break
                except Exception as e:
                    if "RESOURCE_EXHAUSTED" not in str(e) or tb_l <= 4:
                        raise
                    gc.collect()
                    jax.clear_caches()
                    tb_l //= 2
            extra["train_v2large_batch"] = tb_l
            extra["train_v2large_step_s"] = round(dt_l, 3)
            extra["train_v2large_tokens_per_s"] = round(tb_l * tt / dt_l, 1)
            tflops_l, mfu_l = _model_flops(tcfg_l, tparams_l, tb_l, dt_l)
            extra["train_v2large_model_tflops"] = tflops_l
            extra["train_v2large_mfu_pct"] = mfu_l

            if section("train_s2s"):
                with _section_guard("train_s2s"):
                    gc.collect()
                    jax.clear_caches()
                    tb_s = int(os.environ.get("BENCH_TRAIN_B_S2S", "8"))
                    while True:
                        try:
                            dt_s, _ = _train_once(tcfg_l, tb_s, _s2s_batch,
                                                  mode="s2s",
                                                  tparams=tparams_l)
                            break
                        except Exception as e:
                            if ("RESOURCE_EXHAUSTED" not in str(e)
                                    or tb_s <= 2):
                                raise
                            gc.collect()
                            jax.clear_caches()
                            tb_s //= 2
                    U = 4 * tt
                    extra["train_s2s_batch"] = tb_s
                    extra["train_s2s_step_s"] = round(dt_s, 3)
                    # loss tokens = text + units (+1 dur token/char, excluded)
                    extra["train_s2s_tokens_per_s"] = round(
                        tb_s * (tt + U) / dt_s, 1)

    # opt-in streaming latency: production dims (chunked streaming encoder +
    # dense_1b EMMA monotonic decoder), warm ms per 320 ms chunk and xRT
    print(json.dumps({
        "metric": "s2st_rtf_v2_large_10s_worstcase",
        "value": round(rtf, 5),
        "unit": "RTF (wall / audio seconds, single chip)",
        "vs_baseline": round(0.1 / rtf, 3),
        "extra": extra,
    }))


def _wait_for_backend(deadline_s: float) -> None:
    """Block until the TPU backend initializes (the remote axon service can be
    transiently UNAVAILABLE); raise the last error past the deadline."""
    import jax

    t0, delay = time.time(), 30.0
    while True:
        try:
            jax.devices()
            return
        except Exception as e:  # noqa: BLE001 - backend init raises RuntimeError
            if time.time() - t0 > deadline_s:
                raise
            print(f"# TPU backend unavailable ({type(e).__name__}); retrying "
                  f"in {delay:.0f}s", flush=True)
            # jax caches backend-init failures per process; drop them so the
            # next jax.devices() actually re-dials the service
            try:
                from jax._src import xla_bridge as _xb
                _xb._backend_errors.clear()
                _xb._clear_backends()
            except Exception:
                pass
            time.sleep(delay)
            delay = min(delay * 1.5, 120.0)


if __name__ == "__main__":
    import os

    # The scored bench must survive a transient axon-service outage: wait for
    # the backend (bounded) before starting the one-shot measurement.
    _wait_for_backend(float(os.environ.get("BENCH_BACKEND_DEADLINE_S", "1500")))
    main()
