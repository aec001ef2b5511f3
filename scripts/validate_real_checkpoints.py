#!/usr/bin/env python
"""One-command real-checkpoint validation harness.

Run this the day reference checkpoints become reachable: it converts every
model family from original fairseq2 ``.pt`` files and replays the reference's
published golden anchors with per-family PASS/FAIL/SKIP reporting.

    python scripts/validate_real_checkpoints.py --checkpoint-dir /path/to/ckpts

Expected files in --checkpoint-dir (any subset; missing files SKIP that family):

    seamlessM4T_v2_large.pt        multitask UnitY v2 (+ tokenizer.model,
    seamlessM4T_large.pt           spm_char_lang38_tc.model)
    tokenizer.model                NLLB-100 sentencepiece model
    spm_char_lang38_tc.model       char tokenizer (v2 NAR frontend)
    vocoder_v2.pt                  unit HiFi-GAN (v2)
    vocoder_36langs.pt             unit HiFi-GAN (v1)
    conformer_shaw.pt              standalone pretrained speech encoder
    nar_t2u_aligner.pt             UnitY2 aligner
    xlsr2_1b_v2.pt                 XLSR unit-extractor encoder
    kmeans_10k.npy                 unit-extractor kmeans centroids
    LJ037-0171_sr16k.wav           the reference test fixture audio
                                   (https://dl.fbaipublicfiles.com/seamlessM4T/LJ037-0171_sr16k.wav)
    pretssel_melhifigan_wm-16khz.pt   PRETSSEL expressive vocoder (optional)
    pretssel_activations.npz       recorded reference activations (optional:
                                   {"mel": ..., "wav": ...} for the same input)
    seamless_streaming_unity.pt    SeamlessStreaming UnitY (speech encoder+NAR)
    seamless_streaming_monotonic_decoder.pt   EMMA monotonic text decoder
    m2m_expressive_unity.pt        SeamlessExpressive prosody UnitY2 (gated)
    tokenizer_nllb100.model        NLLB-100 SPM for v1/streaming (optional;
                                   falls back to tokenizer.model)

Golden anchors replayed (values copied from the reference test suite):

  - T2TT eng->deu exact sentences
    (reference tests/integration/inference/test_translator.py:13-15)
  - multiple-tasks t2st/s2st/asr Spanish round trip
    (test_translator.py:57-95)
  - conformer_shaw encoder output mean/std
    (tests/integration/models/test_conformer_shaw.py:20: -0.0001 / 0.1547)
  - UnitY2 aligner durations on LJ037-0171
    (tests/integration/models/test_unity2_aligner.py:20-37)
  - vocoder / PRETSSEL: finite nonzero waveform (+ optional recorded
    activations comparison)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
from typing import Callable, Dict, List, Optional

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# ---------------------------------------------------------------------------
# reference anchors (verbatim values from the reference test suite)
# ---------------------------------------------------------------------------

ENG_SENTENCE = (
    "On Monday, scientists from the Stanford University School of Medicine "
    "announced the invention of a new diagnostic tool that can sort cells by "
    "type: a tiny printable chip that can be manufactured using standard "
    "inkjet printers for possibly about one U.S. cent each.")
DEU_SENTENCE = (
    "Am Montag kündigten Wissenschaftler der Stanford University School of "
    "Medicine die Erfindung eines neuen Diagnosewerkzeugs an, das Zellen nach "
    "Typ sortieren kann: ein winziger druckbarer Chip, der mit Standard-"
    "Tintenstrahldruckern für etwa einen US-Cent hergestellt werden kann.")
DEU_SENTENCE_V2 = (
    "Am Montag kündigten Wissenschaftler der Stanford University School of "
    "Medicine die Erfindung eines neuen diagnostischen Werkzeugs an, das "
    "Zellen nach Typ sortieren kann: ein winziger druckbarer Chip, der mit "
    "Standard-Tintenstrahldrucker für möglicherweise etwa einen US-Cent pro "
    "Stück hergestellt werden kann.")
SPA_SENTENCE = "Hola, espero que todo se esté haciendo bien."
ENG_HELLO = "Hello! I hope you're all doing well."

CONFORMER_REF_MEAN, CONFORMER_REF_STD = -0.0001, 0.1547

ALIGNER_REF_TEXT = ("the examination and testimony of the experts enabled the "
                    "commision to conclude that five shots may have been fired")
ALIGNER_REF_DURATIONS_FP32 = [
    1, 1, 2, 1, 1, 5, 5, 6, 4, 3, 2, 3, 4, 4, 2, 2, 2, 1,
    1, 1, 3, 3, 3, 4, 3, 3, 4, 3, 4, 3, 2, 2, 1, 1, 1, 1,
    2, 4, 6, 5, 4, 3, 4, 5, 5, 16, 6, 3, 5, 5, 3, 3, 1, 2,
    1, 1, 1, 2, 3, 2, 3, 1, 3, 3, 3, 2, 2, 4, 2, 2, 2, 3,
    2, 4, 5, 4, 5, 8, 3, 17, 2, 2, 3, 2, 5, 4, 6, 3, 1, 1,
    4, 4, 3, 5, 3, 3, 2, 2, 2, 2, 2, 2, 2, 1, 2, 2, 1, 1,
    2, 6, 4, 5, 9, 5, 1, 12]


# ---------------------------------------------------------------------------
# selftest: synthetic tiny checkpoints so the harness's loading / wiring /
# anchor plumbing executes in CI (VERDICT r3 item 6). The exporters invert the
# converter layouts (checkpoint/fairseq_export.py); golden-anchor equality is
# replaced by structural checks (finiteness, MAS duration-sum identity, both
# modalities produced) — real numerics still need real weights.
# ---------------------------------------------------------------------------

SELFTEST_LANGS = ["eng", "fra", "deu", "spa"]
_ST_WORDS = ["▁the", "▁cat", "▁sat", "▁on", "▁mat", "▁a", "▁dog", ".", ",",
             "▁he", "llo", "▁wor", "ld"]
_ST_CHARS = ["▁"] + list("abcdefghijklmnopqrstuvwxyz.,")
_ST_TEXT = "hello world"


def _selftest_mono_cfg():
    from seamless_communication_tpu.models.monotonic.model import (
        MonotonicDecoderConfig,
    )
    return MonotonicDecoderConfig(
        model_dim=64, num_layers=2, num_heads=4, ffn_inner_dim=128,
        vocab_size=256, num_monotonic_energy_layers=2, pre_decision_ratio=2)


def _selftest_voc_cfg():
    from seamless_communication_tpu.models.vocoder.codehifigan import (
        CodeHifiGanConfig,
    )
    from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig
    return CodeHifiGanConfig(
        num_units=100, unit_embed_dim=32, num_langs=4, lang_embed_dim=8,
        num_spkrs=4, spkr_embed_dim=8, dur_predictor_hidden=16,
        hifigan=HifiGanConfig(model_in_dim=48, upsample_initial_channel=64,
                              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),)))


def _selftest_pretssel_cfg():
    from seamless_communication_tpu.models.pretssel.ecapa_tdnn import EcapaConfig
    from seamless_communication_tpu.models.pretssel.streamable import SeanetConfig
    from seamless_communication_tpu.models.pretssel.vocoder import PretsselConfig
    from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig
    return PretsselConfig(
        num_units=112, model_dim=32, num_heads=2, ffn_inner_dim=64,
        conv_kernel_size=5, num_encoder_layers=1, num_decoder_layers=1,
        num_langs=4, lang_embed_dim=8, prosody_dim=16, pn_conv_dim=16,
        pn_layers=2, pn_kernel_size=5, var_pred_hidden=16,
        hifigan=HifiGanConfig(model_in_dim=80, upsample_initial_channel=32,
                              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),)),
        seanet=SeanetConfig(dimension=16, n_filters=4, ratios=(4, 2), lstm=1),
        ecapa=EcapaConfig(channels=(16, 16, 16, 16, 32),
                          kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
                          attention_channels=8, res2net_scale=4, se_channels=8,
                          groups=(1,) * 5, embed_dim=16, input_dim=80))


def _selftest_aligner_cfgs():
    from seamless_communication_tpu.models.aligner.model import AlignerConfig
    from seamless_communication_tpu.models.unit_extractor.wav2vec2_raw import (
        Wav2Vec2RawConfig,
    )
    a_cfg = AlignerConfig(embed_dim=16, feat_dim=24, text_vocab_size=64,
                          unit_vocab_size=120, text_layers=2, feat_layers=3)
    x_cfg = Wav2Vec2RawConfig(model_dim=32, feature_dim=16,
                              conv_layers=((16, 3, 2), (16, 2, 2)),
                              pos_conv_kernel=8, pos_conv_groups=4,
                              num_layers=2, num_heads=4, ffn_inner_dim=64)
    return a_cfg, x_cfg


def _selftest_text_opts():
    from seamless_communication_tpu.inference.generator import (
        SequenceGeneratorOptions,
    )
    return SequenceGeneratorOptions(beam_size=2, soft_max_seq_len=(0, 16),
                                    hard_max_seq_len=16)


def make_selftest_dir(d: str) -> None:
    """Generate every file the harness expects, at tiny dims, into ``d``."""
    import wave

    import jax
    import torch

    from seamless_communication_tpu.checkpoint.fairseq_export import (
        export_aligner, export_conformer_shaw_fairseq1, export_monotonic_fairseq1,
        export_pretssel, export_unity, export_vocoder, export_w2v2_raw,
    )
    from seamless_communication_tpu.models.aligner.model import aligner_init
    from seamless_communication_tpu.models.monotonic.model import (
        monotonic_decoder_init,
    )
    from seamless_communication_tpu.models.pretssel.vocoder import pretssel_init
    from seamless_communication_tpu.models.unit_extractor.wav2vec2_raw import (
        wav2vec2_raw_init,
    )
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.models.vocoder.codehifigan import (
        code_hifigan_init,
    )
    from seamless_communication_tpu.text.spm import (
        TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN, build_spm_model,
    )

    os.makedirs(d, exist_ok=True)
    key = jax.random.PRNGKey

    def save(name, obj):
        torch.save(obj, os.path.join(d, name))

    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    with open(os.path.join(d, "tokenizer.model"), "wb") as f:
        f.write(build_spm_model(
            base + [(w, -float(20 - len(w)), TYPE_NORMAL) for w in _ST_WORDS]
            + [(c, -30.0, TYPE_NORMAL) for c in _ST_CHARS]))
    with open(os.path.join(d, "spm_char_lang38_tc.model"), "wb") as f:
        f.write(build_spm_model(
            base + [(c, -1.0, TYPE_NORMAL) for c in _ST_CHARS]))

    # 2 s of a 300 Hz sine as the LJ fixture stand-in (16 kHz 16-bit mono)
    t = np.arange(32000) / 16000.0
    pcm = (0.1 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16)
    with wave.open(os.path.join(d, "LJ037-0171_sr16k.wav"), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())

    v2 = unity.unity_init(key(0), get_arch("tiny_v2"))
    save("seamlessM4T_v2_large.pt", {"model": export_unity(v2)})
    save("conformer_shaw.pt",
         {"model": export_conformer_shaw_fairseq1(v2["speech_encoder"])})
    save("seamlessM4T_large.pt", {"model": export_unity(
        unity.unity_init(key(1), get_arch("tiny_v1")), conv_batch_norm=True)})
    save("m2m_expressive_unity.pt", {"model": export_unity(
        unity.unity_init(key(2), get_arch("tiny_expressive")))})
    save("seamless_streaming_unity.pt", {"model": export_unity(
        unity.unity_init(key(3), get_arch("tiny_v2")))})
    save("seamless_streaming_monotonic_decoder.pt",
         {"model": export_monotonic_fairseq1(
             monotonic_decoder_init(key(4), _selftest_mono_cfg()))})
    voc_cfg = _selftest_voc_cfg()
    save("vocoder_v2.pt", {"generator": export_vocoder(
        code_hifigan_init(key(5), voc_cfg))})
    save("vocoder_36langs.pt", {"generator": export_vocoder(
        code_hifigan_init(key(6), voc_cfg))})
    a_cfg, x_cfg = _selftest_aligner_cfgs()
    save("nar_t2u_aligner.pt", export_aligner(aligner_init(key(7), a_cfg)))
    save("xlsr2_1b_v2.pt", {"model": export_w2v2_raw(
        wav2vec2_raw_init(key(8), x_cfg))})
    rng = np.random.default_rng(0)
    np.save(os.path.join(d, "kmeans_10k.npy"),
            rng.standard_normal((10, x_cfg.model_dim)).astype(np.float32))
    p_cfg = _selftest_pretssel_cfg()
    save("pretssel_melhifigan_wm-16khz.pt",
         {"model": export_pretssel(pretssel_init(key(9), p_cfg), p_cfg)})


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

class Ctx:
    def __init__(self, ckpt_dir: str, dtype_name: str, *,
                 selftest: bool = False):
        self.dir = ckpt_dir
        self.dtype_name = dtype_name
        self.selftest = selftest
        self._cache: Dict[str, object] = {}

    def path(self, name: str) -> Optional[str]:
        p = os.path.join(self.dir, name)
        return p if os.path.exists(p) else None

    def need(self, *names: str) -> List[str]:
        missing = [n for n in names if self.path(n) is None]
        if missing:
            raise FileNotFoundError(", ".join(missing))
        return [self.path(n) for n in names]

    # --- cached loaders -----------------------------------------------------

    def dtype(self):
        import jax.numpy as jnp
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.dtype_name]

    def wav(self) -> np.ndarray:
        (p,) = self.need("LJ037-0171_sr16k.wav")
        try:
            import soundfile as sf
            data, sr = sf.read(p, dtype="float32")
        except ImportError:
            import wave
            with wave.open(p, "rb") as f:
                sr = f.getframerate()
                raw = f.readframes(f.getnframes())
                data = (np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0)
                if f.getnchannels() > 1:
                    data = data.reshape(-1, f.getnchannels())
        if data.ndim > 1:
            data = data.mean(axis=1)
        assert sr == 16000, f"expected 16 kHz fixture, got {sr}"
        return data

    def text_tokenizer(self, family: str = "v2"):
        """Per-family NLLB tokenizer: v2 uses the NLLB-200 tokenizer.model and
        the v2 card's lang list; v1/streaming are NLLB-100 models whose lang
        ids come from unity_nllb-100's lang list (and whose SPM is the
        seamless-m4t-large tokenizer.model — drop it in as
        tokenizer_nllb100.model, else tokenizer.model is used for both)."""
        from seamless_communication_tpu.assets import load_card
        from seamless_communication_tpu.text.nllb import NllbTokenizer
        from seamless_communication_tpu.text.spm import SentencePieceModel
        if family != "v2":
            family = "nllb100"   # v1/expressivity/streaming share one tokenizer
        key = f"text_tok_{family}"
        if key in self._cache:
            return self._cache[key]
        if self.selftest:
            (p,) = self.need("tokenizer.model")
            langs = [f"__{l}__" for l in SELFTEST_LANGS]
        elif family == "v2":
            (p,) = self.need("tokenizer.model")
            langs = [f"__{l}__" for l in load_card("seamlessM4T_v2_large")
                     .get("langs", [])]
        else:
            p = self.path("tokenizer_nllb100.model") or \
                self.need("tokenizer.model")[0]
            langs = [f"__{l}__" for l in load_card("unity_nllb-100")
                     .get("langs", [])]
        tok = NllbTokenizer(SentencePieceModel.from_file(p), langs=langs)
        self._cache[key] = tok
        return tok

    def translator(self, family: str):
        """family: 'v2' or 'v1'."""
        key = f"translator_{family}"
        if key in self._cache:
            return self._cache[key]
        from seamless_communication_tpu.assets import load_card
        from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
            apply_unity_fixups, fairseq1_to_fairseq2_auto, load_pt_state_dict,
            unity_tree_from_fairseq2, vocoder_tree_from_pt,
        )
        from seamless_communication_tpu.inference.translator import Translator
        from seamless_communication_tpu.models.unity.builder import get_arch
        from seamless_communication_tpu.models.unity.unit_tokenizer import (
            UnitTokenizer,
        )
        from seamless_communication_tpu.models.vocoder.codehifigan import (
            CodeHifiGanConfig,
        )
        from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
        import jax

        if family == "v2":
            ckpt, voc = "seamlessM4T_v2_large.pt", "vocoder_v2.pt"
            card_name = "seamlessM4T_v2_large"
        else:
            ckpt, voc = "seamlessM4T_large.pt", "vocoder_36langs.pt"
            card_name = "seamlessM4T_large"
        (ckpt_p,) = self.need(ckpt)
        if self.selftest:
            # v1 duplicates lang symbols x2 (+<mask>): 1 lang keeps the unit
            # vocab within tiny_v1's 112
            card = {"num_units": 100,
                    "unit_langs": SELFTEST_LANGS if family == "v2" else ["eng"],
                    "model_arch": "base_v2" if family == "v2" else "base"}
            cfg = get_arch("tiny_v2" if family == "v2" else "tiny_v1")
        else:
            card = load_card(card_name)
            cfg = get_arch(card["model_arch"])

        char_tok = None
        if family == "v2":
            (char_p,) = self.need("spm_char_lang38_tc.model")
            char_tok = CharTokenizer.from_file(char_p)

        sd = load_pt_state_dict(ckpt_p)
        if any(k.startswith("encoder.w2v_encoder") or ".w2v_model." in k
               for k in sd):
            # fairseq1-keyed original checkpoint: key remap + the embedding
            # fixups the reference applies on this path only (loader.py:116-176
            # — NLLB-100 dummy-row drop, control-symbol permutation, char
            # reorder to dictionary order, tied-embedding dedup)
            sd = fairseq1_to_fairseq2_auto(sd)
            char_pieces = (["<pad>"] + list(char_tok.spm.pieces)
                           if char_tok is not None else None)
            sd = apply_unity_fixups(sd, char_spm_pieces=char_pieces)
        params = unity_tree_from_fairseq2(sd, v2=(family == "v2"))
        params = jax.tree.map(
            lambda a: jax.numpy.asarray(a, self.dtype()), params)

        voc_params = voc_cfg = None
        lang_spkr = card.get("lang_spkr_idx_map")
        if self.path(voc):
            voc_params = vocoder_tree_from_pt(load_pt_state_dict(self.path(voc)))
            if self.selftest:
                voc_cfg = _selftest_voc_cfg()
                lang_spkr = {
                    "multilingual": {l: i for i, l in enumerate(SELFTEST_LANGS)},
                    "multispkr": {l: [i] for i, l in enumerate(SELFTEST_LANGS)}}
            else:
                voc_cfg = CodeHifiGanConfig()
                voc_card = load_card("vocoder_v2" if family == "v2"
                                     else "vocoder_36langs")
                lang_spkr = voc_card.get("lang_spkr_idx_map", lang_spkr)
        unit_tok = UnitTokenizer(card.get("num_units", 10000),
                                 card.get("unit_langs", []),
                                 card["model_arch"])
        tr = Translator(params, cfg, self.text_tokenizer(family), unit_tok,
                        char_tok,
                        vocoder_params=voc_params, vocoder_cfg=voc_cfg,
                        lang_spkr_idx_map=lang_spkr,
                        text_opts=_selftest_text_opts() if self.selftest
                        else None)
        self._cache[key] = tr
        return tr


# --- family checks ----------------------------------------------------------

def check_t2tt_v2(ctx: Ctx):
    tr = ctx.translator("v2")
    src = _ST_TEXT if ctx.selftest else ENG_SENTENCE
    texts, _ = tr.predict(src, "t2tt", "deu", src_lang="eng")
    if ctx.selftest:
        assert len(texts) == 1 and isinstance(texts[0], str)
        return "t2tt executed end-to-end (selftest: anchor not checked)"
    assert texts[0] == DEU_SENTENCE_V2, f"got: {texts[0]!r}"
    return "exact German sentence match (v2)"


def check_t2tt_v1(ctx: Ctx):
    tr = ctx.translator("v1")
    src = _ST_TEXT if ctx.selftest else ENG_SENTENCE
    texts, _ = tr.predict(src, "t2tt", "deu", src_lang="eng")
    if ctx.selftest:
        assert len(texts) == 1 and isinstance(texts[0], str)
        return "t2tt executed end-to-end (selftest: anchor not checked)"
    assert texts[0] == DEU_SENTENCE, f"got: {texts[0]!r}"
    return "exact German sentence match (v1)"


def check_multiple_tasks_v2(ctx: Ctx):
    """t2st eng -> s2st spa -> asr spa round trip (test_translator.py:57-95)."""
    tr = ctx.translator("v2")
    src = _ST_TEXT if ctx.selftest else ENG_HELLO
    _, speech = tr.predict(src, "t2st", "eng", src_lang="eng")
    assert speech is not None and np.isfinite(speech.audio_wavs[0]).all()
    spa_text, spa_speech = tr.predict(np.asarray(speech.audio_wavs[0]),
                                      "s2st", "spa")
    assert np.isfinite(spa_speech.audio_wavs[0]).all()
    asr_text, _ = tr.predict(np.asarray(spa_speech.audio_wavs[0]), "asr", "spa")
    if ctx.selftest:
        assert isinstance(spa_text[0], str) and isinstance(asr_text[0], str)
        # drive the QUALITY-SCORER plumbing too (VERDICT r04 item 7): the
        # own-ASR ASR-BLEU route (cli/eval_utils.py compute_asr_bleu with a
        # Translator-backed transcribe callable) must have fired once before
        # weights day. The score itself is meaningless on random weights —
        # only finiteness and a clean (warning-free) pass are asserted.
        from seamless_communication_tpu.cli.eval_utils import (
            compute_asr_bleu, compute_quality_metrics,
        )

        def transcribe(wavs):
            texts, _ = tr.predict([np.asarray(w, np.float32) for w in wavs],
                                  "asr", "spa")
            return [str(t) for t in texts]

        bleu = compute_asr_bleu([np.asarray(spa_speech.audio_wavs[0])],
                                ["hola mundo"], transcribe=transcribe,
                                lang="spa")
        qm = compute_quality_metrics([asr_text[0] or ""], ["hola mundo"],
                                     lang="spa", task="ASR")
        assert np.isfinite(bleu) and np.isfinite(qm["wer"])
        return (f"t2st/s2st/asr round trip + ASR-BLEU/WER scorers executed "
                f"(selftest)")
    assert spa_text[0] == SPA_SENTENCE, f"got: {spa_text[0]!r}"
    assert asr_text[0] == SPA_SENTENCE, f"got: {asr_text[0]!r}"
    return "t2st/s2st/asr Spanish round trip matches"


def check_conformer_shaw(ctx: Ctx):
    import jax.numpy as jnp
    from seamless_communication_tpu.audio.fbank import fbank_numpy
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        conformer_shaw_tree_from_pt, load_pt_state_dict,
    )
    from seamless_communication_tpu.models.wav2vec2.encoder import (
        conformer_shaw_standalone_forward,
    )

    (p,) = ctx.need("conformer_shaw.pt")
    tree = conformer_shaw_tree_from_pt(load_pt_state_dict(p))
    wav = ctx.wav()
    fb = jnp.asarray(fbank_numpy(wav))[None]
    n_frames = jnp.array([fb.shape[1]], jnp.int32)
    st_cfg = None
    if ctx.selftest:
        from seamless_communication_tpu.models.unity.builder import get_arch
        st_cfg = get_arch("tiny_v2").speech
    out, out_lens = conformer_shaw_standalone_forward(
        tree, jnp.asarray(fb, ctx.dtype()), n_frames, st_cfg)
    arr = np.asarray(out[0, :int(out_lens[0])], np.float64)
    mean, std = round(float(arr.mean()), 4), round(float(arr.std(ddof=1)), 4)
    if ctx.selftest:
        assert np.isfinite(arr).all() and std > 0 and int(out_lens[0]) > 0
        return f"encoder ran: mean/std {mean}/{std} finite (selftest)"
    assert (mean, std) == (CONFORMER_REF_MEAN, CONFORMER_REF_STD), \
        f"mean/std {mean}/{std} != {CONFORMER_REF_MEAN}/{CONFORMER_REF_STD}"
    return f"encoder mean/std {mean}/{std} match"


def check_aligner(ctx: Ctx):
    from seamless_communication_tpu.models.aligner.extractor import (
        AlignmentExtractor,
    )
    from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
    a_p, x_p, k_p, c_p = ctx.need("nar_t2u_aligner.pt", "xlsr2_1b_v2.pt",
                                  "kmeans_10k.npy", "spm_char_lang38_tc.model")
    if ctx.selftest:
        a_cfg, x_cfg = _selftest_aligner_cfgs()
        extractor = AlignmentExtractor(
            a_p, x_p, k_p, output_layer=2,
            char_tokenizer=CharTokenizer.from_file(c_p),
            aligner_cfg=a_cfg, xlsr_cfg=x_cfg)
        # short clip: the tiny XLSR stack only downsamples 4x
        durations, _ = extractor.extract_alignment(ctx.wav()[:3200],
                                                   "the cat sat")
        got = np.asarray(durations).reshape(-1)
        n_units = len(extractor.extract_units(ctx.wav()[:3200]))
        # MAS identity: the monotonic alignment spends every unit exactly once
        assert int(got.sum()) == n_units and (got >= 0).all()
        return (f"aligner ran: {got.size} durations sum to {n_units} units "
                "(selftest MAS identity)")
    extractor = AlignmentExtractor(a_p, x_p, k_p, output_layer=35,
                                   char_tokenizer=CharTokenizer.from_file(c_p))
    durations, _ = extractor.extract_alignment(ctx.wav(), ALIGNER_REF_TEXT)
    got = [int(d) for d in np.asarray(durations).reshape(-1)]
    assert got == ALIGNER_REF_DURATIONS_FP32, \
        f"durations differ at {next(i for i,(a,b) in enumerate(zip(got, ALIGNER_REF_DURATIONS_FP32)) if a != b)}"
    return f"{len(got)} durations match exactly"


def check_pretssel(ctx: Ctx):
    import jax
    import jax.numpy as jnp
    from seamless_communication_tpu.audio.fbank import fbank_numpy
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        load_pt_state_dict, pretssel_tree_from_pt,
    )
    from seamless_communication_tpu.models.pretssel.vocoder import (
        pretssel_16khz_config, pretssel_forward,
    )

    (p,) = ctx.need("pretssel_melhifigan_wm-16khz.pt")
    cfg = _selftest_pretssel_cfg() if ctx.selftest else pretssel_16khz_config()
    params = pretssel_tree_from_pt(load_pt_state_dict(p), cfg)
    wav = ctx.wav()
    fb = jnp.asarray(fbank_numpy(wav))[None]
    rng = np.random.default_rng(0)
    U = 64
    units = jnp.asarray(rng.integers(4, cfg.num_units, (1, U)), jnp.int32)
    durs = jnp.full((1, U), 2, jnp.int32)
    out = pretssel_forward(params, cfg, units, jnp.array([U]), durs,
                           fb.astype(ctx.dtype()), jnp.array([fb.shape[1]]),
                           jnp.array([0]), max_mel_len=160)
    w = np.asarray(out.waveform, np.float32)
    assert np.isfinite(w).all() and float(np.abs(w).max()) > 1e-4
    npz = ctx.path("pretssel_activations.npz")
    if npz:
        rec = np.load(npz)
        np.testing.assert_allclose(np.asarray(out.mel, np.float32),
                                   rec["mel"], atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(w, rec["wav"], atol=1e-2, rtol=1e-2)
        return "waveform finite + recorded activations match"
    return "waveform finite/nonzero (no recorded activations provided)"


def check_expressivity(ctx: Ctx):
    """SeamlessExpressive: convert the gated prosody-UnitY2
    (m2m_expressive_unity.pt) + PRETSSEL 16 kHz vocoder and run expressive
    S2ST on the LJ fixture — dual fbank normalization (per-utterance CMVN for
    translation, gcmvn for prosody), ECAPA prosody encoder + FiLM, duration
    factor 1.0 (reference cli/expressivity/predict/predict.py:56-179). The
    reference publishes no expressive golden strings; asserts conversion plus
    text + a finite nonzero expressive waveform."""
    import jax
    import jax.numpy as jnp
    from seamless_communication_tpu.assets import load_card
    from seamless_communication_tpu.audio.fbank import fbank_numpy
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        apply_unity_fixups, fairseq1_to_fairseq2, load_pt_state_dict,
        pretssel_tree_from_pt, unity_tree_from_fairseq2,
    )
    from seamless_communication_tpu.inference.pretssel_generator import (
        PretsselGenerator,
    )
    from seamless_communication_tpu.inference.translator import Translator
    from seamless_communication_tpu.models.pretssel.vocoder import (
        pretssel_16khz_config,
    )
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.models.unity.unit_tokenizer import (
        UnitTokenizer,
    )
    from seamless_communication_tpu.text.char_tokenizer import CharTokenizer

    e_p, v_p, char_p = ctx.need("m2m_expressive_unity.pt",
                                "pretssel_melhifigan_wm-16khz.pt",
                                "spm_char_lang38_tc.model")
    if ctx.selftest:
        card = {"num_units": 100, "unit_langs": SELFTEST_LANGS,
                "model_arch": "base_v2"}
        cfg = get_arch("tiny_expressive")
    else:
        card = load_card("seamless_expressivity")
        cfg = get_arch(card["model_arch"])
    char_tok = CharTokenizer.from_file(char_p)

    sd = load_pt_state_dict(e_p)
    if any(".w2v_model." in k for k in sd):   # prefix is s2t_model.encoder...
        sd = fairseq1_to_fairseq2(sd, has_prosody=True)
        sd = apply_unity_fixups(
            sd, char_spm_pieces=["<pad>"] + list(char_tok.spm.pieces))
    params = jax.tree.map(lambda a: jnp.asarray(a, ctx.dtype()),
                          unity_tree_from_fairseq2(sd, v2=True))
    assert "prosody_encoder" in params, "ECAPA prosody encoder missing"

    if ctx.selftest:
        voc_cfg = _selftest_pretssel_cfg()
        gcmvn_mean, gcmvn_std = np.zeros(80), np.ones(80)
        langs = SELFTEST_LANGS
    else:
        voc_cfg = pretssel_16khz_config()
        voc_card = load_card("vocoder_pretssel_16khz")
        mc = voc_card.get("model_config") or {}
        gcmvn_mean = np.asarray(mc.get("gcmvn_stats", {}).get("mean",
                                                              np.zeros(80)))
        gcmvn_std = np.asarray(mc.get("gcmvn_stats", {}).get("std",
                                                             np.ones(80)))
        langs = mc.get("langs", [])
    voc_params = jax.tree.map(
        lambda a: jnp.asarray(a, ctx.dtype()),
        pretssel_tree_from_pt(load_pt_state_dict(v_p), voc_cfg))
    generator = PretsselGenerator(
        voc_params, voc_cfg,
        lang_to_index={l: i for i, l in enumerate(langs)})

    unit_tok = UnitTokenizer(card.get("num_units", 10000),
                             card.get("unit_langs", []), card["model_arch"])
    tr = Translator(params, cfg, ctx.text_tokenizer("nllb100"), unit_tok,
                    char_tok,
                    text_opts=_selftest_text_opts() if ctx.selftest else None)
    wav = ctx.wav()
    fbank = fbank_numpy(wav)
    gcmvn = ((fbank - gcmvn_mean[None]) / gcmvn_std[None]).astype(np.float32)
    texts, speech = tr.predict(wav, "s2st", "fra",
                               duration_factor=1.0,
                               prosody_encoder_input=gcmvn)
    wavs = generator.predict(speech.units, "fra", gcmvn[None],
                             np.array([gcmvn.shape[0]]), duration_factor=1.0)
    w = np.asarray(wavs[0], np.float32)
    if ctx.selftest:
        assert isinstance(texts[0], str) and np.isfinite(w).all()
        return (f"expressive S2ST executed (selftest): "
                f"{len(speech.units[0])} units, {w.size} samples")
    assert texts and texts[0], "no translated text"
    assert w.size and np.isfinite(w).all() and float(np.abs(w).max()) > 1e-4
    return f"expressive S2ST: text={texts[0][:60]!r}, {w.size} samples"


def check_streaming(ctx: Ctx):
    """SeamlessStreaming: convert the fairseq1-keyed streaming UnitY + EMMA
    monotonic decoder checkpoints and run the online S2T pipeline over the LJ
    fixture. The reference publishes no streaming golden strings, so this
    asserts conversion + a coherent online decode (non-empty text)."""
    import jax
    import jax.numpy as jnp
    from seamless_communication_tpu.assets import load_card
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        apply_unity_fixups, fairseq1_to_fairseq2_auto, load_pt_state_dict,
        monotonic_tree_from_pt, unity_tree_from_fairseq2,
    )
    from seamless_communication_tpu.models.monotonic.model import (
        MonotonicDecoderConfig,
    )
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.streaming.pipeline import (
        StreamingSession, build_s2t_pipeline,
    )

    u_p, m_p = ctx.need("seamless_streaming_unity.pt",
                        "seamless_streaming_monotonic_decoder.pt")
    if ctx.selftest:
        cfg = get_arch("tiny_v2")
    else:
        card = load_card("seamless_streaming_unity")
        cfg = get_arch(card["model_arch"])
    sd = load_pt_state_dict(u_p)
    if any(k.startswith("encoder.w2v_encoder") or ".w2v_model." in k
           for k in sd):
        sd = fairseq1_to_fairseq2_auto(sd)   # streaming: t2u, no text dec
        sd = apply_unity_fixups(sd)          # no-op without final_proj
    params = jax.tree.map(lambda a: jnp.asarray(a, ctx.dtype()),
                          unity_tree_from_fairseq2(sd, v2=True))
    mono_params = jax.tree.map(
        lambda a: jnp.asarray(a, ctx.dtype()),
        monotonic_tree_from_pt(load_pt_state_dict(m_p)))
    if ctx.selftest:
        mono_cfg = _selftest_mono_cfg()
        kw = dict(min_starting_wait_w2vbert=16, decision_threshold=0.4,
                  max_len_b=12, max_consecutive_writes=6)
    else:
        mono_cfg = MonotonicDecoderConfig()  # dense_1b defaults
        kw = {}

    pipe = build_s2t_pipeline(params, cfg, mono_params, mono_cfg,
                              ctx.text_tokenizer("nllb100"), tgt_lang="eng",
                              **kw)
    session = StreamingSession(pipe, segment_size_ms=320, tgt_lang="eng")
    parts = []
    finished = False
    for _, seg in session.run(ctx.wav()):
        if isinstance(getattr(seg, "content", None), str) and seg.content:
            parts.append(seg.content)
        finished = finished or seg.finished
    text = " ".join(parts).strip()
    assert finished, "pipeline did not finish"
    if ctx.selftest:
        return f"streaming pipeline ran to finish (selftest), text={text[:60]!r}"
    assert text, "no streaming text emitted"
    return f"streaming ASR-style S2T emitted: {text[:120]!r}"


CHECKS: List[tuple] = [
    ("t2tt_v2", check_t2tt_v2),
    ("t2tt_v1", check_t2tt_v1),
    ("multiple_tasks_v2", check_multiple_tasks_v2),
    ("conformer_shaw", check_conformer_shaw),
    ("aligner", check_aligner),
    ("pretssel", check_pretssel),
    ("expressivity", check_expressivity),
    ("streaming", check_streaming),
]


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--only", nargs="*", default=None,
                    help=f"subset of checks: {[n for n, _ in CHECKS]}")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="float32 matches the reference fp32 anchors")
    ap.add_argument("--report", default=None, help="write JSON report here")
    ap.add_argument("--selftest", action="store_true",
                    help="generate synthetic tiny-dim fairseq-keyed "
                         "checkpoints into --checkpoint-dir and run every "
                         "check with structural assertions instead of golden "
                         "anchors (CI backstop for the harness plumbing)")
    args = ap.parse_args(argv)

    if args.selftest:
        # tiny deterministic models: run on CPU (and never contend for the
        # one real TPU chip). sitecustomize pre-imports jax on the axon
        # platform, so set the config, not the env var.
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        make_selftest_dir(args.checkpoint_dir)

    ctx = Ctx(args.checkpoint_dir, args.dtype, selftest=args.selftest)
    results = {}
    for name, fn in CHECKS:
        if args.only and name not in args.only:
            continue
        t0 = time.time()
        try:
            detail = fn(ctx)
            results[name] = {"status": "PASS", "detail": detail}
        except FileNotFoundError as e:
            results[name] = {"status": "SKIP", "detail": f"missing: {e}"}
        except Exception as e:
            results[name] = {"status": "FAIL",
                             "detail": f"{type(e).__name__}: {e}",
                             "traceback": traceback.format_exc()}
        results[name]["seconds"] = round(time.time() - t0, 1)
        print(f"[{results[name]['status']:4s}] {name}: "
              f"{results[name]['detail']} ({results[name]['seconds']}s)",
              flush=True)

    n_fail = sum(r["status"] == "FAIL" for r in results.values())
    n_pass = sum(r["status"] == "PASS" for r in results.values())
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{sum(r['status'] == 'SKIP' for r in results.values())} skipped")
    if args.report:
        with open(args.report, "w") as f:
            json.dump(results, f, indent=2)
    if args.selftest and any(r["status"] != "PASS" for r in results.values()):
        return 1   # in selftest every family must execute (SKIP = missing gen)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
