"""CLI loading-path tests: the original-.pt route of
load_unity_model_and_tokenizers (the only route for SeamlessExpressive /
SeamlessStreaming, which have no HF release), fairseq1 family-flag
auto-detection, and the reference-layout gated-asset dir mapping
(reference store.py:12-32 add_gated_assets)."""

import numpy as np
import pytest
import torch

import jax

from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
    fairseq1_to_fairseq2_auto, is_fairseq1_unity,
)
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.text.spm import (
    build_spm_model, TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN,
)

from tests.unit.test_fairseq2_convert import export_unity


def test_fairseq1_auto_streaming_family():
    """seamless_streaming_unity has a T2U stack but NO text decoder (the
    reference loads it with use_text_decoder=False — unity_pipeline.py:113-121),
    so its fairseq1 'decoder.*' keys are the T2U decoder and must NOT be
    remapped as a text decoder."""
    z = np.zeros((4, 2), np.float32)
    sd = {
        "encoder.w2v_encoder.w2v_model.layer_norm.weight": z,
        "synthesizer_encoder.layer_norm.weight": z,
        "decoder.layers.0.ffn.ffn.0.weight": z,        # NAR conv1d block
        "decoder.output_projection.weight": z,
        "decoder.embed_tokens.weight": z,
    }
    out = fairseq1_to_fairseq2_auto(sd)
    assert "t2u_model.encoder.layer_norm.weight" in out
    assert "t2u_model.decoder.layers.0.conv1d.conv1.weight" in out
    assert "t2u_model.final_proj.weight" in out
    assert not any(k.startswith(("text_decoder", "final_proj")) for k in out)
    # fixups are a no-op without a text decoder's final_proj (reference
    # loader.py:115 guards the same way)
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        apply_unity_fixups,
    )
    fixed = apply_unity_fixups(dict(out))
    assert set(fixed) == set(out)


def test_unity_tree_without_text_decoder():
    """A streaming-style fairseq2 key space (no text decoder) must build a
    tree without 'text_decoder' instead of crashing."""
    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(1), cfg)
    sd = export_unity(params)
    sd = {k: v for k, v in sd.items()
          if not k.startswith(("text_decoder", "text_encoder", "final_proj"))}
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        unity_tree_from_fairseq2,
    )
    tree = unity_tree_from_fairseq2(sd, v2=True)
    assert "text_decoder" not in tree and "speech_encoder" in tree
    assert "t2u" in tree


def test_fairseq1_auto_flag_detection():
    z = np.zeros((4, 2), np.float32)
    w2v = "w2v_encoder.w2v_model.layer_norm.weight"
    # expressive: s2t_model.* prefix
    out = fairseq1_to_fairseq2_auto({f"s2t_model.encoder.{w2v}": z})
    assert "speech_encoder_frontend.post_extract_layer_norm.weight" in out
    # standard UnitY: target_letter_decoder present
    out = fairseq1_to_fairseq2_auto({
        f"encoder.{w2v}": z,
        "target_letter_decoder.layer_norm.weight": z})
    assert "text_decoder.layer_norm.weight" in out
    # S2T-only with text encoder: shared_decoder + speech_encoder prefixes
    out = fairseq1_to_fairseq2_auto({
        f"speech_encoder.{w2v}": z,
        "shared_decoder.layer_norm.weight": z,
        "text_encoder.layers.0.self_attn_layer_norm.weight": z})
    assert "text_decoder.layer_norm.weight" in out
    assert "text_encoder.layers.0.self_attn_layer_norm.weight" in out
    assert is_fairseq1_unity({f"encoder.{w2v}": z})
    assert not is_fairseq1_unity({"speech_encoder.inner.layers.0.x": z})


@pytest.fixture()
def tiny_card_dir(tmp_path, monkeypatch):
    """A SEAMLESS_CARDS_DIR with a tiny_v2 card + on-disk tiny tokenizer."""
    spm = build_spm_model(
        [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
         ("</s>", 0.0, TYPE_CONTROL)]
        + [(w, -2.0, TYPE_NORMAL) for w in ["▁aa", "▁bb", ".", ","]])
    spm_path = tmp_path / "tok.model"
    spm_path.write_bytes(spm)
    (tmp_path / "tiny_pt_test.yaml").write_text(
        "name: tiny_pt_test\n"
        "model_type: unity\n"
        "model_arch: tiny_v2\n"
        f"tokenizer: {spm_path}\n"
        "langs: [eng, fra]\n"
        "num_units: 100\n"
        "unit_langs: [eng, fra]\n")
    monkeypatch.setenv("SEAMLESS_CARDS_DIR", str(tmp_path))
    return tmp_path


def test_load_unity_model_from_pt(tiny_card_dir):
    from seamless_communication_tpu.cli.loading import (
        load_unity_model_and_tokenizers,
    )

    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    pt = tiny_card_dir / "tiny.pt"
    torch.save({"model": export_unity(params)}, pt)

    got, got_cfg, text_tok, unit_tok, char_tok = (
        load_unity_model_and_tokenizers("tiny_pt_test",
                                        local_pt_path=str(pt),
                                        dtype=np.float32))
    assert got_cfg == cfg
    ok = jax.tree.all(jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a, np.float32), np.asarray(b)),
        params, got))
    assert ok, "pt-loaded tree differs from exported params"
    assert text_tok.lang_to_id["__fra__"] > 0


def test_load_monotonic_decoder_from_pt(tmp_path, monkeypatch):
    """load_monotonic_decoder converts an original torch .pt named by the
    card (here a synthetic fairseq2-keyed one)."""
    from seamless_communication_tpu.cli.loading import load_monotonic_decoder
    from seamless_communication_tpu.models.monotonic.model import (
        MonotonicDecoderConfig, monotonic_decoder_init,
    )
    from tests.unit.test_fairseq2_convert import export_monotonic

    cfg = MonotonicDecoderConfig(
        model_dim=64, num_layers=2, num_heads=4, ffn_inner_dim=128,
        vocab_size=256, num_monotonic_energy_layers=2, pre_decision_ratio=2)
    params = monotonic_decoder_init(jax.random.PRNGKey(2), cfg)
    pt = tmp_path / "mono.pt"
    torch.save({"model": export_monotonic(params)}, pt)
    (tmp_path / "tiny_mono_test.yaml").write_text(
        "name: tiny_mono_test\nmodel_type: monotonic_decoder\n"
        f"model_arch: dense_1b\ncheckpoint: {pt}\n")
    monkeypatch.setenv("SEAMLESS_CARDS_DIR", str(tmp_path))
    got, _cfg = load_monotonic_decoder("tiny_mono_test", dtype=np.float32)
    ok = jax.tree.all(jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a, np.float32), np.asarray(b)),
        params, got))
    assert ok


def test_gated_dir_reference_layout(tmp_path, monkeypatch):
    """SEAMLESS_GATED_ASSETS with the reference's file names rewrites the
    gated cards' checkpoints (store.py:17-30 layout, plus <card>.pt)."""
    from seamless_communication_tpu.assets import load_card

    (tmp_path / "m2m_expressive_unity.pt").write_bytes(b"x")
    (tmp_path / "vocoder_pretssel_16khz.pt").write_bytes(b"x")
    monkeypatch.setenv("SEAMLESS_GATED_ASSETS", str(tmp_path))
    assert load_card("seamless_expressivity")["checkpoint"] == \
        str(tmp_path / "m2m_expressive_unity.pt")
    # fallback <card>.pt naming
    assert load_card("vocoder_pretssel_16khz")["checkpoint"] == \
        str(tmp_path / "vocoder_pretssel_16khz.pt")
    # untouched when the file is absent
    assert str(load_card("vocoder_pretssel")["checkpoint"]).endswith(
        "gated=true")
