"""Streaming agent pipelines (reference streaming/agents/seamless_streaming_s2st.py
and unity_pipeline.py): wire feature-extractor -> speech encoder -> EMMA text
decoder -> [detokenizer | NAR unit decoder -> vocoder]."""

from __future__ import annotations

from typing import Optional

import numpy as np

from seamless_communication_tpu.models.monotonic.model import MonotonicDecoderConfig
from seamless_communication_tpu.models.unity.builder import UnitYConfig
from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.models.vocoder.codehifigan import CodeHifiGanConfig
from seamless_communication_tpu.streaming.agents.common import (
    AgentPipeline, Segment, SpeechSegment, TreeAgentPipeline,
)
from seamless_communication_tpu.streaming.agents.detokenizer import DetokenizerAgent
from seamless_communication_tpu.streaming.agents.offline_w2v_bert_encoder import (
    OfflineWav2VecBertEncoderAgent,
)
from seamless_communication_tpu.streaming.agents.online_feature_extractor import (
    OnlineFeatureExtractorAgent,
)
from seamless_communication_tpu.streaming.agents.online_text_decoder import (
    MMASpeechToTextDecoderAgent, UnitYMMATextDecoderAgent,
)
from seamless_communication_tpu.streaming.agents.online_unit_decoder import (
    NARUnitYUnitDecoderAgent,
)
from seamless_communication_tpu.streaming.agents.online_vocoder import VocoderAgent
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer


def _maybe_quantize_mono(mono_params: dict, quantize_int8: Optional[bool]):
    """int8 weight-only quantization of the EMMA monotonic decoder.

    The streaming chunk's dominant HBM cost is the write burst: every decode
    step streams the full dense_1b decoder weights plus the 256k tied vocab
    table (xplane-measured ~2.2 ms/token bf16 on v5e). int8 halves both
    reads — same scheme the offline UnitY decode path defaults to. None =
    auto: on for TPU backends, off elsewhere (hermetic CPU tests stay exact).
    """
    if quantize_int8 is None:
        import jax
        try:
            quantize_int8 = jax.default_backend() == "tpu"
        except Exception:
            quantize_int8 = False
    if not quantize_int8:
        return mono_params
    from seamless_communication_tpu.ops.quantization import quantize_params
    return quantize_params(mono_params)


def _resolve_fused(fused, unity_cfg: UnitYConfig):
    """Resolve fused="auto": incremental needs a chunk-causal encoder to stay
    exact (models/wav2vec2/incremental.py guard); production streaming cards
    are chunk-causal, tiny test cards may not be."""
    if fused != "auto":
        return fused
    sp = unity_cfg.speech
    if (sp.chunk_size and sp.left_chunk_num == -1
            and sp.conformer.causal_depthwise_conv):
        return "incremental"
    return True


def build_s2t_pipeline(unity_params: dict, unity_cfg: UnitYConfig,
                       mono_params: dict, mono_cfg: MonotonicDecoderConfig,
                       text_tokenizer: NllbTokenizer, *, tgt_lang: str = "eng",
                       min_starting_wait_w2vbert: int = 192,
                       decision_threshold: float = 0.5,
                       denormalize: bool = False, max_len_b: int = 200,
                       max_consecutive_writes: int = 50,
                       min_gen_len: int = 0,
                       mono_quantize_int8: Optional[bool] = None,
                       fused="auto") -> AgentPipeline:
    """SeamlessStreaming S2TT/ASR pipeline (seamless_streaming_s2t.py:22-43).

    ``fused="auto"`` (default) resolves to ``"incremental"`` — encoder +
    monotonic prefill + EMMA write burst as ONE compiled program per chunk
    (streaming/fused.py), encoding only the NEW fbank block each chunk (exact
    for chunk-causal encoders; O(T) total encoder compute, zero mid-stream
    recompiles) — when the card's encoder is chunk-causal (the production
    streaming archs are), else to plain fused. ``fused=False`` keeps the
    reference's separate encoder/decoder agents (needed for ``no_early_stop``
    / ``block_ngrams`` policy variants)."""
    mono_params = _maybe_quantize_mono(mono_params, mono_quantize_int8)
    fused = _resolve_fused(fused, unity_cfg)
    if fused:
        from seamless_communication_tpu.streaming.fused import (
            FusedMMASpeechToTextDecoderAgent,
            IncrementalFusedMMASpeechToTextDecoderAgent,
        )
        agent_cls = (IncrementalFusedMMASpeechToTextDecoderAgent
                     if fused == "incremental"
                     else FusedMMASpeechToTextDecoderAgent)
        return AgentPipeline([
            OnlineFeatureExtractorAgent(denormalize=denormalize),
            agent_cls(
                unity_params, unity_cfg, mono_params, mono_cfg, text_tokenizer,
                tgt_lang=tgt_lang, min_gen_len=min_gen_len,
                min_starting_wait=min_starting_wait_w2vbert,
                max_len_b=max_len_b,
                max_consecutive_writes=max_consecutive_writes,
                decision_threshold=decision_threshold),
            DetokenizerAgent(),
        ])
    return AgentPipeline([
        OnlineFeatureExtractorAgent(denormalize=denormalize),
        OfflineWav2VecBertEncoderAgent(unity_params, unity_cfg,
                                       min_starting_wait=min_starting_wait_w2vbert),
        MMASpeechToTextDecoderAgent(mono_params, mono_cfg, text_tokenizer,
                                    tgt_lang=tgt_lang, max_len_b=max_len_b,
                                    max_consecutive_writes=max_consecutive_writes,
                                    decision_threshold=decision_threshold),
        DetokenizerAgent(),
    ])


def build_s2st_pipeline(unity_params: dict, unity_cfg: UnitYConfig,
                        mono_params: dict, mono_cfg: MonotonicDecoderConfig,
                        text_tokenizer: NllbTokenizer,
                        unit_tokenizer: UnitTokenizer,
                        char_tokenizer: CharTokenizer,
                        vocoder_params: dict, vocoder_cfg: CodeHifiGanConfig,
                        lang_spkr_idx_map: dict, *, tgt_lang: str = "eng",
                        min_starting_wait_w2vbert: int = 192,
                        decision_threshold: float = 0.5,
                        min_unit_chunk_size: int = 50,
                        denormalize: bool = False, max_len_b: int = 200,
                        max_consecutive_writes: int = 50,
                        text_bucket: int = 16,
                        mono_quantize_int8: Optional[bool] = None,
                        fused="auto") -> AgentPipeline:
    """SeamlessStreaming S2ST pipeline (seamless_streaming_s2st.py:28-36).

    ``fused="auto"`` (default) resolves to ``"incremental"`` for chunk-causal
    encoder cards, else plain fused (see build_s2t_pipeline)."""
    mono_params = _maybe_quantize_mono(mono_params, mono_quantize_int8)
    fused = _resolve_fused(fused, unity_cfg)
    if fused:
        from seamless_communication_tpu.streaming.fused import (
            FusedUnitYMMATextDecoderAgent,
            IncrementalFusedUnitYMMATextDecoderAgent,
        )
        agent_cls = (IncrementalFusedUnitYMMATextDecoderAgent
                     if fused == "incremental"
                     else FusedUnitYMMATextDecoderAgent)
        text_decoder = agent_cls(
            unity_params, unity_cfg, mono_params, mono_cfg, text_tokenizer,
            tgt_lang=tgt_lang, min_starting_wait=min_starting_wait_w2vbert,
            max_len_b=max_len_b, max_consecutive_writes=max_consecutive_writes,
            decision_threshold=decision_threshold)
        head = [OnlineFeatureExtractorAgent(denormalize=denormalize),
                text_decoder]
    else:
        head = [
            OnlineFeatureExtractorAgent(denormalize=denormalize),
            OfflineWav2VecBertEncoderAgent(
                unity_params, unity_cfg,
                min_starting_wait=min_starting_wait_w2vbert),
            UnitYMMATextDecoderAgent(mono_params, mono_cfg, text_tokenizer,
                                     tgt_lang=tgt_lang, max_len_b=max_len_b,
                                     max_consecutive_writes=max_consecutive_writes,
                                     decision_threshold=decision_threshold),
        ]
    return AgentPipeline(head + [
        NARUnitYUnitDecoderAgent(unity_params, unity_cfg, unit_tokenizer,
                                 text_tokenizer, char_tokenizer,
                                 min_unit_chunk_size=min_unit_chunk_size,
                                 text_bucket=text_bucket),
        VocoderAgent(vocoder_params, vocoder_cfg,
                     lang_spkr_idx_map=lang_spkr_idx_map, tgt_lang=tgt_lang),
    ])


def build_s2st_tree_pipeline(unity_params: dict, unity_cfg: UnitYConfig,
                             mono_params: dict, mono_cfg: MonotonicDecoderConfig,
                             text_tokenizer: NllbTokenizer,
                             unit_tokenizer: UnitTokenizer,
                             char_tokenizer: CharTokenizer,
                             vocoder_params: dict, vocoder_cfg: CodeHifiGanConfig,
                             lang_spkr_idx_map: dict, *, tgt_lang: str = "eng",
                             min_starting_wait_w2vbert: int = 192,
                             decision_threshold: float = 0.5,
                             min_unit_chunk_size: int = 50,
                             denormalize: bool = False, max_len_b: int = 200,
                             max_consecutive_writes: int = 50,
                             text_bucket: int = 16,
                             mono_quantize_int8: Optional[bool] = None,
                             fused="auto") -> TreeAgentPipeline:
    """Joint S2TT + S2ST TREE pipeline (reference SeamlessStreamingS2STJointVADAgent,
    seamless_streaming_s2st.py:49-57 over UnitYAgentTreePipeline,
    unity_pipeline.py:197-243): ONE text-decoder feed fans out to a
    detokenizer branch (TextSegment outputs) and a NAR unit decoder → vocoder
    branch (SpeechSegment outputs), so a single session emits simultaneous
    text and waveform. Same knobs as build_s2st_pipeline."""
    from seamless_communication_tpu.streaming.agents.detokenizer import (
        UnitYDetokenizerAgent,
    )

    mono_params = _maybe_quantize_mono(mono_params, mono_quantize_int8)
    fused = _resolve_fused(fused, unity_cfg)
    feat = OnlineFeatureExtractorAgent(denormalize=denormalize)
    if fused:
        from seamless_communication_tpu.streaming.fused import (
            FusedUnitYMMATextDecoderAgent,
            IncrementalFusedUnitYMMATextDecoderAgent,
        )
        agent_cls = (IncrementalFusedUnitYMMATextDecoderAgent
                     if fused == "incremental"
                     else FusedUnitYMMATextDecoderAgent)
        text_decoder = agent_cls(
            unity_params, unity_cfg, mono_params, mono_cfg, text_tokenizer,
            tgt_lang=tgt_lang, min_starting_wait=min_starting_wait_w2vbert,
            max_len_b=max_len_b, max_consecutive_writes=max_consecutive_writes,
            decision_threshold=decision_threshold)
        chain = [feat, text_decoder]
    else:
        encoder = OfflineWav2VecBertEncoderAgent(
            unity_params, unity_cfg,
            min_starting_wait=min_starting_wait_w2vbert)
        text_decoder = UnitYMMATextDecoderAgent(
            mono_params, mono_cfg, text_tokenizer, tgt_lang=tgt_lang,
            max_len_b=max_len_b, max_consecutive_writes=max_consecutive_writes,
            decision_threshold=decision_threshold)
        chain = [feat, encoder, text_decoder]
    detok = UnitYDetokenizerAgent()
    unit_decoder = NARUnitYUnitDecoderAgent(
        unity_params, unity_cfg, unit_tokenizer, text_tokenizer, char_tokenizer,
        min_unit_chunk_size=min_unit_chunk_size, text_bucket=text_bucket)
    vocoder = VocoderAgent(vocoder_params, vocoder_cfg,
                           lang_spkr_idx_map=lang_spkr_idx_map,
                           tgt_lang=tgt_lang)
    tree = {a: [b] for a, b in zip(chain, chain[1:])}
    tree[chain[-1]] = [detok, unit_decoder]
    tree[unit_decoder] = [vocoder]
    return TreeAgentPipeline(tree)


def build_expressive_s2st_pipeline(unity_params: dict, unity_cfg: UnitYConfig,
                                   mono_params: dict,
                                   mono_cfg: MonotonicDecoderConfig,
                                   text_tokenizer: NllbTokenizer,
                                   unit_tokenizer: UnitTokenizer,
                                   char_tokenizer: CharTokenizer,
                                   pretssel_params: dict, pretssel_cfg,
                                   lang_to_index: dict, gcmvn_mean, gcmvn_std, *,
                                   sample_rate: int = 16000,
                                   tgt_lang: str = "eng",
                                   min_starting_wait_w2vbert: int = 192,
                                   decision_threshold: float = 0.5,
                                   min_unit_chunk_size: int = 50,
                                   denormalize: bool = False,
                                   use_vad: bool = False,
                                   mono_quantize_int8: Optional[bool] = None,
                                   fused="auto") -> AgentPipeline:
    """SeamlessExpressive streaming S2ST (reference seamless_s2st.py:35-77): the
    PRETSSEL vocoder agent reads the accumulated source audio for prosody.
    ``fused="auto"`` as in build_s2t_pipeline."""
    mono_params = _maybe_quantize_mono(mono_params, mono_quantize_int8)
    fused = _resolve_fused(fused, unity_cfg)
    from seamless_communication_tpu.streaming.agents.pretssel_vocoder import (
        PretsselVocoderAgent,
    )
    from seamless_communication_tpu.streaming.agents.vad import VADAgent

    feat_agent = OnlineFeatureExtractorAgent(denormalize=denormalize)
    # prosody input = the raw audio accumulated by the feature extractor's states
    upstream_getter = lambda: sum((list(c) for c in feat_agent.states.source), [])
    agents = []
    if use_vad:
        agents.append(VADAgent())
    if fused:
        from seamless_communication_tpu.streaming.fused import (
            FusedUnitYMMATextDecoderAgent,
            IncrementalFusedUnitYMMATextDecoderAgent,
        )
        agent_cls = (IncrementalFusedUnitYMMATextDecoderAgent
                     if fused == "incremental"
                     else FusedUnitYMMATextDecoderAgent)
        text_agents = [agent_cls(
            unity_params, unity_cfg, mono_params, mono_cfg, text_tokenizer,
            tgt_lang=tgt_lang, min_starting_wait=min_starting_wait_w2vbert,
            decision_threshold=decision_threshold)]
    else:
        text_agents = [
            OfflineWav2VecBertEncoderAgent(
                unity_params, unity_cfg,
                min_starting_wait=min_starting_wait_w2vbert),
            UnitYMMATextDecoderAgent(mono_params, mono_cfg, text_tokenizer,
                                     tgt_lang=tgt_lang,
                                     decision_threshold=decision_threshold),
        ]
    agents += [feat_agent] + text_agents + [
        NARUnitYUnitDecoderAgent(unity_params, unity_cfg, unit_tokenizer,
                                 text_tokenizer, char_tokenizer,
                                 min_unit_chunk_size=min_unit_chunk_size),
        PretsselVocoderAgent(pretssel_params, pretssel_cfg,
                             lang_to_index=lang_to_index, gcmvn_mean=gcmvn_mean,
                             gcmvn_std=gcmvn_std, tgt_lang=tgt_lang,
                             sample_rate=sample_rate,
                             upstream_audio_getter=upstream_getter),
    ]
    return AgentPipeline(agents)


class StreamingSession:
    """Push 320 ms source chunks, collect output segments — the host-side driver of
    an agent pipeline (simuleval evaluator inner loop)."""

    def __init__(self, pipeline: AgentPipeline, *, segment_size_ms: int = 320,
                 sample_rate: int = 16000, tgt_lang: Optional[str] = None):
        self.pipeline = pipeline
        self.segment_size = int(segment_size_ms * sample_rate / 1000)
        self.sample_rate = sample_rate
        self.tgt_lang = tgt_lang
        pipeline.reset()

    def run(self, waveform: np.ndarray, *, max_drain_steps: int = 128):
        """Stream the whole waveform; yields (chunk_index, output segment).

        After the source ends the pipeline keeps getting pumped with empty finished
        segments until it emits a finished output (simuleval evaluator loop)."""
        from seamless_communication_tpu.streaming.agents.common import EmptySegment

        n = len(waveform)
        n_chunks = max(1, -(-n // self.segment_size))
        # tree pipelines finish when EVERY leaf branch has emitted a finished
        # segment; linear pipelines when the last agent has (the `finished`
        # property on both covers it)
        done = False
        for i in range(n_chunks):
            chunk = waveform[i * self.segment_size:(i + 1) * self.segment_size]
            seg = SpeechSegment(content=list(np.asarray(chunk, np.float32)),
                                finished=(i == n_chunks - 1),
                                tgt_lang=self.tgt_lang)
            for out in self.pipeline.process(seg):
                yield i, out
            done = self.pipeline.finished
        drain = 0
        while not done and drain < max_drain_steps:
            drain += 1
            for out in self.pipeline.process(
                    EmptySegment(finished=True, tgt_lang=self.tgt_lang)):
                yield n_chunks - 1, out
            done = self.pipeline.finished
