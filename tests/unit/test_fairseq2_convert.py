"""Round-trip tests for checkpoint/convert_fairseq2.py on SYNTHETIC .pt files.

No real checkpoints are available in dev, so these tests invert the converter's
layout conventions: export a random-init param pytree to a fairseq2-style torch
state dict (torch layouts: linear (out,in), conv1d (out,in,k), convT (in,out,k),
weight-norm g/v pairs), torch.save it, then run the production loaders
(load_pt_state_dict -> *_tree_from_fairseq2) and require the EXACT original
pytree back — any transposition, key-name, or stacking mistake in the converter
breaks value equality (dims are chosen non-square so transposes can't silently
cancel).

Caveat: exporter and importer share one reading of the fairseq1/fairseq2 key
names, so a consistently MISREAD key name passes both directions and would only
fail on a real checkpoint. Mitigation: the converter rule tables were audited
mechanically against the reference loaders' key maps (unity loader.py:179-389,
monotonic_decoder loader.py:31-49, conformer_shaw loader.py:44-74) by
synthesizing a concrete key per reference pattern and requiring identical
mappings — zero drift; final backstop is scripts/validate_real_checkpoints.py
when weights are reachable."""

import numpy as np
import pytest
import torch

import jax

from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
    aligner_tree_from_pt, load_pt_state_dict, monotonic_tree_from_fairseq2,
    pretssel_tree_from_pt, unity_tree_from_fairseq2, vocoder_tree_from_pt,
    wav2vec2_raw_tree_from_pt,
)
from seamless_communication_tpu.models.monotonic.model import (
    MonotonicDecoderConfig, monotonic_decoder_init,
)
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.models.vocoder.codehifigan import (
    CodeHifiGanConfig, code_hifigan_init,
)
from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig


from seamless_communication_tpu.checkpoint.fairseq_export import (
    _t, _unstack, _x_lin, _x_ln, export_aligner, export_conformer_shaw_fairseq1,
    export_monotonic, export_monotonic_fairseq1, export_pretssel, export_unity,
    export_vocoder, export_w2v2_raw,
)

# --- tests -------------------------------------------------------------------

def _assert_trees_equal(expected, got, *, atol=0.0):
    e_flat = jax.tree_util.tree_flatten_with_path(expected)[0]
    g_flat = {jax.tree_util.keystr(p): leaf
              for p, leaf in jax.tree_util.tree_flatten_with_path(got)[0]}
    e_keys = {jax.tree_util.keystr(p) for p, _ in e_flat}
    assert e_keys == set(g_flat), (
        f"missing: {sorted(e_keys - set(g_flat))[:5]} "
        f"extra: {sorted(set(g_flat) - e_keys)[:5]}")
    for p, leaf in e_flat:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(g_flat[key]),
                                   atol=atol, rtol=0, err_msg=key)


def test_unity_pt_roundtrip(tmp_path):
    params = unity.unity_init(jax.random.PRNGKey(0), get_arch("tiny_v2"))
    path = tmp_path / "unity.pt"
    torch.save({"model": export_unity(params)}, path)
    got = unity_tree_from_fairseq2(load_pt_state_dict(str(path)))
    _assert_trees_equal(params, got)


def test_expressive_unity_pt_roundtrip(tmp_path):
    """FiLM (decoder layers + duration predictor), prosody_proj, and the
    model's own ECAPA must all land in the converted tree (round-1 regression:
    FiLM was injected after stacking and silently dropped)."""
    params = unity.unity_init(jax.random.PRNGKey(3), get_arch("tiny_expressive"))
    path = tmp_path / "unity_exp.pt"
    torch.save({"model": export_unity(params)}, path)
    got = unity_tree_from_fairseq2(load_pt_state_dict(str(path)))
    assert "film" in got["t2u"]["decoder_layers"]
    assert "film" in got["t2u"]["duration_predictor"]
    assert "prosody_proj" in got["t2u"]
    assert "prosody_encoder" in got
    _assert_trees_equal(params, got)


def test_ar_t2u_unity_pt_roundtrip(tmp_path):
    """v1: XL-attention conformer (batch-norm conv module) + AR T2U enc-dec."""
    params = unity.unity_init(jax.random.PRNGKey(4), get_arch("tiny_v1"))
    path = tmp_path / "unity_v1.pt"
    torch.save({"model": export_unity(params, conv_batch_norm=True)}, path)
    got = unity_tree_from_fairseq2(load_pt_state_dict(str(path)))
    assert "decoder" in got["t2u"] and "encoder" in got["t2u"]
    _assert_trees_equal(params, got)


def test_pretssel_pt_roundtrip(tmp_path):
    from seamless_communication_tpu.models.pretssel.ecapa_tdnn import EcapaConfig
    from seamless_communication_tpu.models.pretssel.streamable import SeanetConfig
    from seamless_communication_tpu.models.pretssel.vocoder import (
        PretsselConfig, pretssel_init,
    )
    cfg = PretsselConfig(
        num_units=48, model_dim=16, num_heads=2, ffn_inner_dim=32,
        conv_kernel_size=3, num_encoder_layers=2, num_decoder_layers=2,
        num_langs=4, lang_embed_dim=8, prosody_dim=24, mel_dim=8,
        pn_conv_dim=12, pn_layers=3, pn_kernel_size=5,
        var_pred_hidden=8,
        hifigan=HifiGanConfig(model_in_dim=8, upsample_rates=(5, 2),
                              upsample_kernel_sizes=(10, 4),
                              upsample_initial_channel=16,
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),),
                              add_ups_out_pad=True, final_tanh=False),
        seanet=SeanetConfig(n_filters=4, dimension=8, ratios=(4, 2), lstm=2),
        ecapa=EcapaConfig(channels=(16, 16, 16, 16, 48), attention_channels=8,
                          res2net_scale=4, se_channels=8, embed_dim=24,
                          input_dim=80))
    params = pretssel_init(jax.random.PRNGKey(5), cfg)
    path = tmp_path / "pretssel.pt"
    torch.save({"model": export_pretssel(params, cfg)}, path)
    got = pretssel_tree_from_pt(load_pt_state_dict(str(path)), cfg)
    _assert_trees_equal(params, got, atol=1e-6)


def test_aligner_pt_roundtrip(tmp_path):
    from seamless_communication_tpu.models.aligner.model import (
        AlignerConfig, aligner_init,
    )
    cfg = AlignerConfig(embed_dim=16, feat_dim=24, text_vocab_size=32,
                        unit_vocab_size=40, text_layers=2, feat_layers=3)
    params = aligner_init(jax.random.PRNGKey(6), cfg)
    path = tmp_path / "aligner.pt"
    torch.save(export_aligner(params), path)
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    ckpt = {k: ({kk: vv.numpy() for kk, vv in v.items()} if isinstance(v, dict)
                else v) for k, v in ckpt.items()}
    got = aligner_tree_from_pt(ckpt)
    _assert_trees_equal(params, got)
    # char reorder: pieces c,a,b at rows 4,5,6 -> row 4 takes dict row of "c"
    pieces = ["<unk>", "<s>", "</s>", "<pad>"] + ["c", "a", "b"] \
        + [chr(ord("d") + i) for i in range(cfg.text_vocab_size - 7)]
    got2 = aligner_tree_from_pt(ckpt, char_spm_pieces=pieces)
    te = np.asarray(params["embed_text"]["embedding"])
    np.testing.assert_array_equal(got2["embed_text"]["embedding"][4], te[6])
    np.testing.assert_array_equal(got2["embed_text"]["embedding"][5], te[4])
    np.testing.assert_array_equal(got2["embed_text"]["embedding"][6], te[5])


def test_wav2vec2_raw_pt_roundtrip(tmp_path):
    from seamless_communication_tpu.models.unit_extractor.wav2vec2_raw import (
        Wav2Vec2RawConfig, wav2vec2_raw_init,
    )
    cfg = Wav2Vec2RawConfig(model_dim=32, feature_dim=16,
                            conv_layers=((16, 3, 2), (16, 2, 2)),
                            pos_conv_kernel=8, pos_conv_groups=4,
                            num_layers=2, num_heads=4, ffn_inner_dim=64)
    params = wav2vec2_raw_init(jax.random.PRNGKey(7), cfg)
    path = tmp_path / "xlsr.pt"
    torch.save({"model": export_w2v2_raw(params)}, path)
    got = wav2vec2_raw_tree_from_pt(load_pt_state_dict(str(path)))
    # pos_conv weight-norm fold: exact up to one rounding step
    _assert_trees_equal(params, got, atol=1e-6)


def test_monotonic_pt_roundtrip(tmp_path):
    cfg = MonotonicDecoderConfig(
        model_dim=64, num_layers=2, num_heads=4, ffn_inner_dim=128,
        vocab_size=256, num_monotonic_energy_layers=2, pre_decision_ratio=2)
    params = monotonic_decoder_init(jax.random.PRNGKey(1), cfg)
    path = tmp_path / "monotonic.pt"
    torch.save({"model": export_monotonic(params)}, path)
    got = monotonic_tree_from_fairseq2(load_pt_state_dict(str(path)))
    _assert_trees_equal(params, got)


def test_monotonic_fairseq1_pt_roundtrip(tmp_path):
    """Real streaming checkpoints are fairseq1-keyed ('decoder.*',
    encoder_attn.{source,target}_energy_layer / energy_bias — reference
    monotonic_decoder/loader.py:31-49). Export to THAT key space (with the
    control-symbol permutation pre-inverted) and require monotonic_tree_from_pt
    to detect + remap + fix up back to the exact original tree."""
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        monotonic_tree_from_pt,
    )

    cfg = MonotonicDecoderConfig(
        model_dim=64, num_layers=2, num_heads=4, ffn_inner_dim=128,
        vocab_size=256, num_monotonic_energy_layers=2, pre_decision_ratio=2)
    params = monotonic_decoder_init(jax.random.PRNGKey(3), cfg)
    sd = export_monotonic_fairseq1(params)
    path = tmp_path / "monotonic_f1.pt"
    torch.save({"model": sd}, path)
    got = monotonic_tree_from_pt(load_pt_state_dict(str(path)))
    _assert_trees_equal(params, got)


def test_vocoder_pt_roundtrip(tmp_path):
    cfg = CodeHifiGanConfig(
        num_units=100, unit_embed_dim=32, num_langs=4, lang_embed_dim=8,
        num_spkrs=4, spkr_embed_dim=8, dur_predictor_hidden=16,
        hifigan=HifiGanConfig(model_in_dim=48, upsample_initial_channel=32,
                              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),)))
    params = code_hifigan_init(jax.random.PRNGKey(2), cfg)
    path = tmp_path / "vocoder.pt"
    torch.save({"generator": export_vocoder(params)}, path)
    got = vocoder_tree_from_pt(load_pt_state_dict(str(path)))
    # weight-norm fold uses sqrt/divide: exact up to one rounding step
    _assert_trees_equal(params, got, atol=1e-6)


def test_apply_unity_fixups():
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        apply_unity_fixups,
    )
    rng = np.random.default_rng(0)
    embeds = rng.normal(size=(10, 4)).astype(np.float32)
    char = rng.normal(size=(7, 4)).astype(np.float32)
    t2u_proj = rng.normal(size=(5, 4)).astype(np.float32)
    sd = {"final_proj.weight": embeds.copy(),
          "t2u_model.decoder_frontend.embed_char.weight": char.copy(),
          "t2u_model.final_proj.weight": t2u_proj.copy(),
          "t2u_model.decoder_frontend.embed.weight": np.zeros((5, 4), np.float32)}
    # char spm order: pieces "c","a","b" at model rows 4,5,6; dictionary order
    # (sorted) puts a->4, b->5, c->6, so model row i takes old row mapping[i]
    out = apply_unity_fixups(sd, is_nllb_100=False,
                             char_spm_pieces=["<unk>", "<s>", "</s>", "<pad>",
                                              "c", "a", "b"])
    # control-symbol permutation (BOS,PAD,EOS,UNK)->(PAD,UNK,BOS,EOS)
    np.testing.assert_array_equal(out["final_proj.weight"][[0, 1, 2, 3]],
                                  embeds[[1, 3, 0, 2]])
    np.testing.assert_array_equal(out["final_proj.weight"][4:], embeds[4:])
    # tied into both frontends
    np.testing.assert_array_equal(out["text_decoder_frontend.embed.weight"],
                                  out["final_proj.weight"])
    np.testing.assert_array_equal(out["text_encoder_frontend.embed.weight"],
                                  out["final_proj.weight"])
    # char reorder: mapping = [0,1,2,3] + [dict_idx of "c","a","b"] = ...,6,4,5
    got_char = out["t2u_model.decoder_frontend.embed_char.weight"]
    np.testing.assert_array_equal(got_char[4], char[6])
    np.testing.assert_array_equal(got_char[5], char[4])
    np.testing.assert_array_equal(got_char[6], char[5])
    # t2u decoder frontend embed tied to t2u final_proj
    np.testing.assert_array_equal(
        out["t2u_model.decoder_frontend.embed.weight"], t2u_proj)


# --- standalone conformer-shaw encoder checkpoint (cards/conformer_shaw.yaml) ---

def test_conformer_shaw_pt_roundtrip(tmp_path):
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        conformer_shaw_tree_from_pt,
    )

    params = unity.unity_init(jax.random.PRNGKey(7), get_arch("tiny_v2"))
    se = params["speech_encoder"]
    path = tmp_path / "conformer_shaw.pt"
    torch.save({"model": export_conformer_shaw_fairseq1(se)}, path)
    got = conformer_shaw_tree_from_pt(load_pt_state_dict(str(path)))
    _assert_trees_equal({"feature_projection": se["feature_projection"],
                         "encoder": se["encoder"]}, got)


def test_finetune_init_speech_encoder_from_conformer_shaw(tmp_path):
    """--init_speech_encoder: the pretrained conformer stack lands in a FRESH
    UnitY model (adaptor/decoder untouched) and the model still trains."""
    import optax

    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        init_speech_encoder_from_conformer_shaw,
    )
    from seamless_communication_tpu.train.trainer import make_train_step

    cfg = get_arch("tiny_v2")
    pretrained = unity.unity_init(jax.random.PRNGKey(8), cfg)
    path = tmp_path / "conformer_shaw.pt"
    torch.save({"model": export_conformer_shaw_fairseq1(
        pretrained["speech_encoder"])}, path)

    fresh = unity.unity_init(jax.random.PRNGKey(9), cfg)
    merged = init_speech_encoder_from_conformer_shaw(
        fresh, load_pt_state_dict(str(path)))
    _assert_trees_equal(merged["speech_encoder"]["encoder"],
                        pretrained["speech_encoder"]["encoder"])
    _assert_trees_equal(merged["text_decoder"], fresh["text_decoder"])
    _assert_trees_equal(merged["speech_encoder"]["adaptor"],
                        fresh["speech_encoder"]["adaptor"])

    # mismatched config is rejected, not silently truncated
    import pytest as _pytest
    with _pytest.raises(ValueError):
        init_speech_encoder_from_conformer_shaw(
            unity.unity_init(jax.random.PRNGKey(1), get_arch("micro")),
            load_pt_state_dict(str(path)))

    # one train step runs on the merged params
    rng = np.random.default_rng(0)
    B, T, L = 2, 64, 8
    batch = {
        "fbank": rng.standard_normal((B, T, 80)).astype(np.float32),
        "fbank_lens": np.array([T, T // 2], np.int32),
        "prev_tokens": rng.integers(4, 200, (B, L)).astype(np.int32),
        "target_tokens": rng.integers(4, 200, (B, L)).astype(np.int32),
        "target_lens": np.array([L, L - 2], np.int32),
    }
    step = jax.jit(make_train_step(cfg, optax.adam(1e-4)))
    p2, _, metrics = step(merged, optax.adam(1e-4).init(merged), batch)
    assert np.isfinite(float(metrics["loss"]))
