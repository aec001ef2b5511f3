"""End-to-end drive of the m4t_evaluate CLI (cli/evaluate.py) on a tiny local HF
checkpoint: TSV manifest -> (native C++ loader when available, Python fallback
otherwise) -> Translator.predict -> hypotheses + score files. Includes a
corrupted audio file, which must come back as an empty hypothesis
(reference cli/m4t/evaluate/evaluate.py:205-245)."""

import csv
import json
import sys

import numpy as np
import pytest
import torch


from seamless_communication_tpu.audio.wav import write_wav
from seamless_communication_tpu.text.spm import (
    build_spm_model, TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN,
)

torch.manual_seed(0)


@pytest.fixture(scope="module")
def tiny_assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("eval_cli")
    # tiny HF checkpoint whose dims exactly match the registered tiny_v2 arch
    from transformers import SeamlessM4Tv2Config, SeamlessM4Tv2Model
    cfg = SeamlessM4Tv2Config(
        hidden_size=64, vocab_size=256, t2u_vocab_size=112, char_vocab_size=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        speech_encoder_layers=2, speech_encoder_attention_heads=4,
        speech_encoder_intermediate_size=128, conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8, right_max_position_embeddings=3,
        speech_encoder_dropout=0.0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, speech_encoder_hidden_act="swish",
        adaptor_kernel_size=8, adaptor_stride=8, adaptor_dropout=0.0,
        num_adapter_layers=1, feature_projection_input_dim=160,
        t2u_encoder_layers=2, t2u_decoder_layers=2,
        t2u_encoder_attention_heads=4, t2u_decoder_attention_heads=4,
        t2u_encoder_ffn_dim=128, t2u_decoder_ffn_dim=128,
        t2u_variance_predictor_embed_dim=64, t2u_variance_predictor_hidden_dim=32,
        t2u_variance_predictor_kernel_size=3, t2u_variance_pred_dropout=0.0,
        speech_encoder_chunk_size=None, position_embeddings_type="relative_key",
        unit_hifi_gan_vocab_size=112, upsample_initial_channel=32,
        upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 2]],
        unit_embed_dim=32, lang_embed_dim=8, spkr_embed_dim=8,
        vocoder_num_langs=4, vocoder_num_spkrs=4, var_pred_dropout=0.0,
        max_position_embeddings=512,
    )
    hf_dir = d / "hf"
    SeamlessM4Tv2Model(cfg).eval().save_pretrained(hf_dir)

    # tiny spm + card
    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    words = ["▁aa", "▁bb", "▁cc", "▁dd"]
    spm_path = d / "tok.model"
    spm_path.write_bytes(build_spm_model(
        base + [(w, -2.0, TYPE_NORMAL) for w in words]))
    cards_dir = d / "cards"
    cards_dir.mkdir()
    (cards_dir / "tiny_eval_test.yaml").write_text(
        "name: tiny_eval_test\n"
        "model_arch: tiny_v2\n"
        f"tokenizer: {spm_path}\n"
        "langs:\n- eng\n- fra\n"
        "num_units: 100\n"
        "unit_langs:\n- eng\n- fra\n")

    # manifest: 3 valid wavs + 1 corrupted
    wav_dir = d / "audio"
    wav_dir.mkdir()
    rows = []
    for i in range(3):
        n = int(16000 * (0.4 + 0.2 * i))
        wav = (0.1 * np.sin(2 * np.pi * (250 + 50 * i)
                            * np.arange(n) / 16000)).astype(np.float32)
        write_wav(str(wav_dir / f"{i}.wav"), wav, 16000)
        rows.append({"audio": f"audio/{i}.wav", "tgt_text": "aa bb"})
    (wav_dir / "bad.wav").write_bytes(b"garbage, not audio")
    rows.insert(1, {"audio": "audio/bad.wav", "tgt_text": "cc"})
    tsv = d / "data.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["audio", "tgt_text"], delimiter="\t")
        w.writeheader()
        w.writerows(rows)
    return dict(root=d, hf=hf_dir, cards=cards_dir, tsv=tsv, n=len(rows))


def test_evaluate_cli_s2tt(tiny_assets, monkeypatch):
    from seamless_communication_tpu.cli import evaluate

    a = tiny_assets
    out_dir = a["root"] / "out"
    monkeypatch.setenv("SEAMLESS_CARDS_DIR", str(a["cards"]))
    monkeypatch.setattr(sys, "argv", [
        "m4t_evaluate", str(a["tsv"]), "s2tt", "eng",
        "--model_name", "tiny_eval_test",
        "--local_hf_path", str(a["hf"]),
        "--batch_size", "2",
        "--audio_root_dir", str(a["root"]),
        "--output_path", str(out_dir),
    ])
    evaluate.main()

    hyps = (out_dir / "hypotheses.txt").read_text().split("\n")
    assert len(hyps) == a["n"]
    assert hyps[1] == ""      # corrupted input -> empty hypothesis
    scores = json.loads((out_dir / "s2tt_scores.json").read_text())
    assert "bleu" in scores or "score" in scores
