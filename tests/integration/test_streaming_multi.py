"""BatchedStreamingPool equality tests: the N-slot batched multi-session pool
(streaming/multi.py) must emit, per session, the EXACT token sequence of the
single-session incremental fused agent (streaming/fused.py) — including the
post-EOS drain-pump semantics of the agent pipeline. Reference counterpart:
none (SimulEval is single-stream per process); the single-session agent — whose
own parity chain runs back through fused==unfused==reference policy semantics
(test_streaming_tiny.py) — is the oracle here."""

import dataclasses

import numpy as np
import pytest

import jax

from seamless_communication_tpu.models.monotonic.model import (
    MonotonicDecoderConfig, monotonic_decoder_init,
)
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.models.wav2vec2.encoder import SpeechEncoderConfig
from seamless_communication_tpu.ops.conformer import ConformerConfig
from seamless_communication_tpu.streaming.multi import BatchedStreamingPool
from seamless_communication_tpu.streaming.pipeline import (
    StreamingSession, build_s2t_pipeline,
)
from seamless_communication_tpu.text.nllb import NllbTokenizer
from seamless_communication_tpu.text.spm import (
    SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN,
)

SEG = 5120  # 320 ms @ 16 kHz

KW = dict(min_starting_wait=16, decision_threshold=0.001, max_len_b=12,
          max_consecutive_writes=6)


@pytest.fixture(scope="module")
def setup():
    # chunk-causal tiny card — the incremental-encoder exactness condition
    # (same card as test_streaming_tiny.py::test_incremental_matches_fused_s2t)
    cfg = dataclasses.replace(
        get_arch("tiny_v2"),
        speech=SpeechEncoderConfig(
            model_dim=64, feature_dim=160, ffn_inner_dim=128,
            num_adaptor_heads=4,
            conformer=ConformerConfig(dim=64, ffn_inner_dim=128, num_heads=4,
                                      num_layers=2, depthwise_kernel_size=7,
                                      pos_type="shaw", shaw_max_left=8,
                                      shaw_max_right=3,
                                      causal_depthwise_conv=True),
            chunk_size=4, left_chunk_num=-1))
    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    words = ["▁aa", "▁bb", "▁cc", ",", "."]
    text_spm = SentencePieceModel.from_bytes(build_spm_model(
        base + [(w, -2.0, TYPE_NORMAL) for w in words]))
    text_tok = NllbTokenizer(text_spm, langs=["__eng__", "__fra__"])
    unity_params = unity.unity_init(jax.random.PRNGKey(3), cfg)
    mono_cfg = MonotonicDecoderConfig(
        model_dim=64, num_layers=2, num_heads=4, ffn_inner_dim=128,
        vocab_size=256, num_monotonic_energy_layers=2, pre_decision_ratio=2)
    mono_params = monotonic_decoder_init(jax.random.PRNGKey(5), mono_cfg)
    return dict(cfg=cfg, unity_params=unity_params, mono_cfg=mono_cfg,
                mono_params=mono_params, text_tok=text_tok)


def wave(freq: float, seconds: float = 2.0) -> np.ndarray:
    t = np.arange(int(seconds * 16000)) / 16000
    return (0.1 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def single_session_tokens(s, wav, tgt_lang="eng"):
    pipe = build_s2t_pipeline(
        s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"],
        s["text_tok"], tgt_lang=tgt_lang, fused="incremental",
        min_starting_wait_w2vbert=KW["min_starting_wait"],
        decision_threshold=KW["decision_threshold"], max_len_b=KW["max_len_b"],
        max_consecutive_writes=KW["max_consecutive_writes"],
        mono_quantize_int8=False)
    list(StreamingSession(pipe, segment_size_ms=320, tgt_lang=tgt_lang).run(wav))
    return list(pipe.agents[1].states.target_indices)


def make_pool(s, n_slots):
    return BatchedStreamingPool(
        s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"],
        s["text_tok"], n_slots=n_slots, mono_quantize_int8=False, **KW)


def drive(pool, schedule, max_drain=128):
    """schedule: {sid: wav}; all sessions start together. Pushes one 320 ms
    chunk per session per tick (finished on its last chunk), steps the pool
    once per tick, then drains until every session finishes."""
    n_chunks = {sid: max(1, -(-len(w) // SEG)) for sid, w in schedule.items()}
    ticks = max(n_chunks.values())
    segs = {sid: [] for sid in schedule}
    for i in range(ticks):
        for sid, w in schedule.items():
            if i < n_chunks[sid]:
                pool.push(sid, w[i * SEG:(i + 1) * SEG],
                          finished=(i == n_chunks[sid] - 1))
        pool.step()
        for sid in schedule:
            segs[sid] += pool.pop(sid)
    drain = 0
    while (not all(pool.session_finished(sid) for sid in schedule)
           and drain < max_drain):
        pool.step()
        drain += 1
        for sid in schedule:
            segs[sid] += pool.pop(sid)
    return segs


def test_pool_matches_single_session(setup):
    """One pooled session (with an idle masked slot alongside) must emit the
    single-session incremental agent's exact token sequence."""
    s = setup
    wav = wave(300)
    want = single_session_tokens(s, wav)
    assert len(want) > 0

    pool = make_pool(s, n_slots=2)
    sid = pool.open_session(tgt_lang="eng")
    segs = drive(pool, {sid: wav})[sid]
    assert pool.session_finished(sid)
    assert pool.session_tokens(sid) == want
    # emitted segments carry the same tokens, in order, and end finished
    flat = [t for g in segs for t in g.token_indices]
    assert flat == want
    assert segs[-1].finished
    assert all(isinstance(g.text, str) for g in segs)


def test_pool_matches_single_session_int8_mono(setup):
    """Same equality under int8 EMMA weight quantization — the TPU serving
    default (streaming/pipeline.py _maybe_quantize_mono): both sides quantize
    identically, so tokens must still match."""
    s = setup
    wav = wave(300)
    pipe = build_s2t_pipeline(
        s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"],
        s["text_tok"], tgt_lang="eng", fused="incremental",
        min_starting_wait_w2vbert=KW["min_starting_wait"],
        decision_threshold=KW["decision_threshold"], max_len_b=KW["max_len_b"],
        max_consecutive_writes=KW["max_consecutive_writes"],
        mono_quantize_int8=True)
    list(StreamingSession(pipe, segment_size_ms=320, tgt_lang="eng").run(wav))
    want = list(pipe.agents[1].states.target_indices)
    assert len(want) > 0

    pool = BatchedStreamingPool(
        s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"],
        s["text_tok"], n_slots=2, mono_quantize_int8=True, **KW)
    sid = pool.open_session(tgt_lang="eng")
    drive(pool, {sid: wav})
    assert pool.session_tokens(sid) == want


def test_pool_staggered_sessions(setup):
    """Two concurrent sessions with different audio and staggered arrival
    (B opens two ticks after A) must each match their own single-session
    run — slot batching must not couple sessions."""
    s = setup
    wav_a, wav_b = wave(300), wave(440, seconds=1.5)
    want_a = single_session_tokens(s, wav_a)
    want_b = single_session_tokens(s, wav_b)

    pool = make_pool(s, n_slots=4)
    a = pool.open_session(tgt_lang="eng")
    # A streams alone for two ticks
    for i in range(2):
        pool.push(a, wav_a[i * SEG:(i + 1) * SEG])
        pool.step()
    b = pool.open_session(tgt_lang="eng")
    na = max(1, -(-len(wav_a) // SEG))
    nb = max(1, -(-len(wav_b) // SEG))
    for j in range(max(na - 2, nb)):
        i = j + 2
        if i < na:
            pool.push(a, wav_a[i * SEG:(i + 1) * SEG], finished=(i == na - 1))
        if j < nb:
            pool.push(b, wav_b[j * SEG:(j + 1) * SEG], finished=(j == nb - 1))
        pool.step()
    drain = 0
    while (not (pool.session_finished(a) and pool.session_finished(b))
           and drain < 128):
        pool.step()
        drain += 1
    assert pool.session_tokens(a) == want_a
    assert pool.session_tokens(b) == want_b


def test_pool_http_serving(setup):
    """The serve() streaming routes (inference/serving.py StreamingPoolService)
    must drive >=2 CONCURRENT sessions through one pool over a real socket,
    each matching its single-session oracle token-for-token."""
    import json
    import threading
    import urllib.request

    from seamless_communication_tpu.inference.serving import serve

    s = setup
    wavs = {"a": wave(300), "b": wave(440, seconds=1.5)}
    want = {k: single_session_tokens(s, w) for k, w in wavs.items()}

    pool = make_pool(s, n_slots=4)
    srv = serve(stream_pool=pool, port=0, stream_tick_ms=10)
    port = srv.server_address[1]

    def post(path, obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/stream/{path}",
            data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())

    results = {}

    def client(key):
        w = wavs[key]
        sid = post("open", {"tgt_lang": "eng"})["session_id"]
        toks = []
        n = max(1, -(-len(w) // SEG))
        for i in range(n):
            out = post("push", {"session_id": sid,
                                "samples": w[i * SEG:(i + 1) * SEG].tolist(),
                                "finished": i == n - 1})
            toks += [t for g in out["segments"] for t in g["tokens"]]
        for _ in range(256):
            out = post("poll", {"session_id": sid})
            toks += [t for g in out["segments"] for t in g["tokens"]]
            if out["finished"]:
                break
        post("close", {"session_id": sid})
        results[key] = toks

    try:
        threads = [threading.Thread(target=client, args=(k,)) for k in wavs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        srv.shutdown()
        srv.stream_service.stop()

    assert results["a"] == want["a"]
    assert results["b"] == want["b"]


def test_pool_slot_reuse(setup):
    """Closing a finished session and opening a new one must reuse the slot
    with fully reset state (encoder stream, fbank residuals, prefix)."""
    s = setup
    wav_a, wav_b = wave(300), wave(500)
    want_b = single_session_tokens(s, wav_b)

    pool = make_pool(s, n_slots=1)
    a = pool.open_session(tgt_lang="eng")
    drive(pool, {a: wav_a})
    assert pool.session_finished(a)
    with pytest.raises(RuntimeError):
        pool.open_session(tgt_lang="eng")   # the only slot is busy
    pool.close_session(a)

    b = pool.open_session(tgt_lang="eng")
    drive(pool, {b: wav_b})
    assert pool.session_finished(b)
    assert pool.session_tokens(b) == want_b
