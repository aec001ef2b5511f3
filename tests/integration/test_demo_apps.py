"""Web-demo task runners driven end-to-end with the tiny hermetic models —
the UI-free layer of demo/app.py and demo/expressive_app.py (reference
demo/m4tv2/app.py:91-157, demo/expressive/app.py:179-238). gradio itself is
not needed: the runners are plain callables the gradio Blocks wire up."""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "demo"))

from app import load_audio, make_task_runners  # noqa: E402
from expressive_app import (  # noqa: E402
    ExpressiveDemo, make_expressive_runner, remove_prosody_tokens_from_text,
)
from lang_list import LANGUAGE_NAME_TO_CODE, task_language_names  # noqa: E402

from seamless_communication_tpu.assets import load_card


def test_lang_list_from_card():
    card = load_card("seamlessM4T_v2_large")
    langs = task_language_names(card)
    assert "English" in langs["text_source"]
    # speech targets are the unit_langs subset, strictly smaller than text
    assert 0 < len(langs["s2st_target"]) < len(langs["t2tt_target"])
    assert langs["s2tt_target"] == langs["t2tt_target"]
    assert LANGUAGE_NAME_TO_CODE["French"] == "fra"


def test_load_audio_truncates_and_resamples(tmp_path):
    from seamless_communication_tpu.audio.wav import write_wav

    warns = []
    # 70 s at 8 kHz -> resampled to 16 kHz, truncated to 60 s
    wav = np.zeros(70 * 8000, np.float32)
    path = tmp_path / "long.wav"
    write_wav(str(path), wav, 8000)
    out, sr = load_audio(str(path), warn=warns.append)
    assert sr == 16000 and out.shape[0] == 60 * 16000 and len(warns) == 1
    # gradio numpy payload with int16 samples
    out2, _ = load_audio((16000, (2 ** 14 * np.ones(80, np.float32)
                                  ).astype(np.int16)), warn=warns.append)
    assert np.abs(out2).max() <= 1.0


def test_m4t_demo_runners(translator_tiny, tmp_path):
    from seamless_communication_tpu.audio.wav import write_wav

    runners = make_task_runners(translator_tiny)
    assert set(runners) == {"s2st", "s2tt", "t2st", "t2tt", "asr"}

    out = runners["t2tt"]("the cat sat", "English", "French")
    assert isinstance(out, str)

    (sr, wav), text = runners["t2st"]("the cat sat", "English", "French")
    assert sr == 16000 and wav.ndim == 1 and wav.size > 0
    assert isinstance(text, str)

    path = tmp_path / "in.wav"
    write_wav(str(path), (0.1 * np.sin(2 * np.pi * 300 * np.arange(16000)
                                       / 16000)).astype(np.float32), 16000)
    asr_text = runners["asr"](str(path), "English")
    assert isinstance(asr_text, str)


def test_expressive_demo_runner(translator_tiny, pretssel_tiny):
    pparams, pcfg = pretssel_tiny
    from seamless_communication_tpu.inference.pretssel_generator import (
        PretsselGenerator,
    )

    gen = PretsselGenerator(pparams, pcfg, lang_to_index={"eng": 0, "fra": 1})
    demo = ExpressiveDemo(translator_tiny, gen, np.zeros(80), np.ones(80))
    runner = make_expressive_runner(demo)
    wav_in = (0.1 * np.sin(2 * np.pi * 300 * np.arange(16000) / 16000)
              ).astype(np.float32)
    (sr, wav), text = runner((16000, wav_in), "English", "French")
    assert sr == 16000 and wav.ndim == 1 and wav.size > 0
    assert "*" not in text and "=" not in text

    assert remove_prosody_tokens_from_text("a * b = c") == "a b c"


def test_build_ui_requires_gradio(translator_tiny):
    """UI assembly is the only gradio-touching layer; with gradio absent it
    must fail with ImportError and nothing else."""
    pytest.importorskip("gradio", reason="gradio not installed (expected)")
