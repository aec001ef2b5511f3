"""manifest_batches tests (reference cli/m4t/finetune/dataloader.py): S2T
field shapes/teacher-forcing, multi-epoch re-iterability, and the AR-T2U
SPEECH_TO_SPEECH unit framing (bos/eos + the +4 control offset of the unit
vocab, matching UnitTokenizer conventions)."""

import json

import numpy as np
import pytest

from seamless_communication_tpu.audio.wav import write_wav
from seamless_communication_tpu.datasets.loader import manifest_batches
from seamless_communication_tpu.text.nllb import NllbTokenizer
from seamless_communication_tpu.text.spm import (
    SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL,
    TYPE_UNKNOWN,
)


@pytest.fixture(scope="module")
def tok():
    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    words = ["▁aa", "▁bb", "▁cc"]
    return NllbTokenizer(SentencePieceModel.from_bytes(build_spm_model(
        base + [(w, -2.0, TYPE_NORMAL) for w in words])),
        langs=["__eng__", "__fra__"])


def _write_manifest(tmp_path, with_units):
    rng = np.random.default_rng(0)
    entries = []
    for i in range(3):
        wav_path = tmp_path / f"a{i}.wav"
        write_wav(str(wav_path),
                  rng.standard_normal(3200).astype(np.float32) * 0.1, 16000)
        tgt = {"text": "aa bb", "lang": "fra"}
        if with_units:
            tgt["units"] = [7, 7, 3, 12]
        entries.append({"source": {"audio_local_path": str(wav_path),
                                   "lang": "eng"},
                        "target": tgt})
    path = tmp_path / "manifest.json"
    path.write_text("\n".join(json.dumps(e) for e in entries))
    return str(path)


def test_s2t_batches_and_reiterability(tmp_path, tok):
    path = _write_manifest(tmp_path, with_units=False)
    data = manifest_batches(path, tok, batch_size=2)
    epochs = [list(data), list(data)]          # re-iterable across epochs
    assert len(epochs[0]) == 2 and len(epochs[1]) == 2
    b = epochs[0][0]
    assert b["fbank"].shape[0] == 2 and b["fbank"].shape[2] == 80
    # teacher forcing: target is prev shifted left by one
    pv, tg, tl = (np.asarray(b["prev_tokens"]), np.asarray(b["target_tokens"]),
                  np.asarray(b["target_lens"]))
    np.testing.assert_array_equal(pv[0, 1:tl[0]], tg[0, :tl[0] - 1])
    assert "prev_units" not in b


def test_s2s_unit_framing(tmp_path, tok):
    path = _write_manifest(tmp_path, with_units=True)
    (b,) = list(manifest_batches(path, tok, batch_size=3, load_units=True))
    pu, tu, ul = (np.asarray(b["prev_units"]), np.asarray(b["target_units"]),
                  np.asarray(b["unit_lens"]))
    # raw units [7,7,3,12] -> +4 offset, bos-prefixed prev, eos-terminated tgt
    assert ul[0] == 5
    np.testing.assert_array_equal(pu[0, :5], [0, 11, 11, 7, 16])
    np.testing.assert_array_equal(tu[0, :5], [11, 11, 7, 16, 2])
    assert (pu[0, 5:] == 1).all() and (tu[0, 5:] == 1).all()  # unit pad=1


def test_s2s_requires_units(tmp_path, tok):
    path = _write_manifest(tmp_path, with_units=False)
    with pytest.raises(ValueError, match="target.units"):
        list(manifest_batches(path, tok, batch_size=2, load_units=True))


@pytest.fixture(scope="module")
def char_tok():
    from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    chars = ["▁"] + list("ab")
    return CharTokenizer(SentencePieceModel.from_bytes(build_spm_model(
        base + [(c, -1.0, TYPE_NORMAL) for c in chars])))


def _write_nar_manifest(tmp_path, durations):
    rng = np.random.default_rng(1)
    wav_path = tmp_path / "nar0.wav"
    write_wav(str(wav_path),
              rng.standard_normal(3200).astype(np.float32) * 0.1, 16000)
    units = [int(u) for u in rng.integers(0, 90, sum(durations))]
    entry = {"source": {"audio_local_path": str(wav_path), "lang": "eng"},
             "target": {"text": "aa bb", "lang": "fra", "units": units,
                        "char_durations": durations}}
    path = tmp_path / "nar_manifest.json"
    path.write_text(json.dumps(entry))
    return str(path), units


def test_nar_s2s_batches_from_manifest(tmp_path, tok, char_tok):
    """NAR mode: char frontend over prev positions + aligner durations +
    duration-expanded unit targets. 'aa bb' -> chars ▁aa▁bb (6)."""
    durs = [2, 1, 1, 3, 1, 2]
    path, units = _write_nar_manifest(tmp_path, durs)
    (b,) = list(manifest_batches(path, tok, batch_size=1, load_units=True,
                                 char_tokenizer=char_tok))
    assert np.asarray(b["char_counts"]).sum() == 6
    td = np.asarray(b["target_durations"])
    np.testing.assert_array_equal(td[0, :6], durs)
    tu = np.asarray(b["target_units"])
    np.testing.assert_array_equal(tu[0, :len(units)],
                                  np.asarray(units) + 4)
    assert (tu[0, len(units):] == 1).all()
    assert "prev_units" not in b

    # duration/char mismatch is rejected with a pointed error
    bad_path, _ = _write_nar_manifest(tmp_path, [1, 1])
    with pytest.raises(ValueError, match="char_durations length"):
        list(manifest_batches(bad_path, tok, batch_size=1, load_units=True,
                              char_tokenizer=char_tok))


def test_nar_s2s_train_step_from_manifest(tmp_path, tok, char_tok):
    """End-to-end NAR: manifest (units + char_durations) -> loader -> one
    SPEECH_TO_SPEECH train step on the NAR-T2U tiny_v2 arch."""
    import jax

    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.train.trainer import (
        FinetuneMode, FinetuneParams, UnitYFinetune,
    )

    path, _ = _write_nar_manifest(tmp_path, [2, 1, 1, 3, 1, 2])
    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    (batch,) = list(manifest_batches(path, tok, batch_size=1,
                                     load_units=True,
                                     char_tokenizer=char_tok))
    ft = FinetuneParams(finetune_mode=FinetuneMode.SPEECH_TO_SPEECH,
                        save_model_path=str(tmp_path / "out"),
                        learning_rate=1e-2, warmup_steps=1)
    tuner = UnitYFinetune(params, cfg, ft)
    p2, _, metrics = tuner.train_step(tuner.params, tuner.opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(params["t2u"]),
                                jax.tree.leaves(p2["t2u"])))
    assert moved, "NAR S2S step did not update t2u params"


def test_ar_s2s_train_step_from_manifest(tmp_path, tok):
    """End-to-end: manifest with units -> loader -> one SPEECH_TO_SPEECH
    train step on the AR-T2U tiny_v1 arch (the m4t_finetune CLI path)."""
    import jax

    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.train.trainer import (
        FinetuneMode, FinetuneParams, UnitYFinetune,
    )

    cfg = get_arch("tiny_v1")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    path = _write_manifest(tmp_path, with_units=True)
    (batch,) = list(manifest_batches(path, tok, batch_size=3,
                                     load_units=True))
    ft = FinetuneParams(finetune_mode=FinetuneMode.SPEECH_TO_SPEECH,
                        save_model_path=str(tmp_path / "out"),
                        learning_rate=1e-2, warmup_steps=1)
    tuner = UnitYFinetune(params, cfg, ft)
    p2, opt2, metrics = tuner.train_step(tuner.params, tuner.opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # the unit loss participates: t2u params moved
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(params["t2u"]),
                                jax.tree.leaves(p2["t2u"])))
    assert moved, "S2S step did not update t2u params"
