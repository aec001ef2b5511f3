"""expressivity_evaluate CLI (reference cli/expressivity/evaluate/evaluate.py:52-322):
batch SeamlessExpressive S2ST over a TSV manifest with the dual fbank normalization
(per-utterance CMVN for translation, gcmvn for prosody), writing waveforms +
hypotheses for downstream ASR-BLEU / vocal-style-similarity scoring."""

from __future__ import annotations

import argparse
import csv
import logging
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("expressivity_evaluate")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("data_file", type=str, help="TSV with 'audio', 'tgt_text'")
    parser.add_argument("--tgt_lang", type=str, required=True)
    parser.add_argument("--audio_root_dir", type=str, default="")
    parser.add_argument("--model_name", type=str, default="seamless_expressivity")
    parser.add_argument("--vocoder_name", type=str, default="vocoder_pretssel")
    parser.add_argument("--duration_factor", type=float, default=1.0)
    parser.add_argument("--output_path", type=str, default="expressive_eval")
    parser.add_argument("--local_hf_path", type=str, default=None)
    parser.add_argument("--gated_model_dir", type=str, default=None,
                        help="dir with gated checkpoints (m2m_expressive_unity.pt, pretssel_melhifigan_wm*.pt); sets SEAMLESS_GATED_ASSETS")
    args = parser.parse_args()
    if args.gated_model_dir:
        import os
        os.environ["SEAMLESS_GATED_ASSETS"] = args.gated_model_dir

    from seamless_communication_tpu.audio.fbank import fbank_numpy
    from seamless_communication_tpu.audio.wav import read_wav, resample, write_wav
    from seamless_communication_tpu.cli.loading import (
        load_pretssel_vocoder, load_unity_model_and_tokenizers,
    )
    from seamless_communication_tpu.inference.pretssel_generator import (
        PretsselGenerator,
    )
    from seamless_communication_tpu.inference.translator import Translator

    params, cfg, text_tok, unit_tok, char_tok = load_unity_model_and_tokenizers(
        args.model_name, local_hf_path=args.local_hf_path)
    translator = Translator(params, cfg, text_tok, unit_tok, char_tok)

    voc_params, voc_cfg, mc, sample_rate = load_pretssel_vocoder(
        args.vocoder_name)
    gcmvn_mean = np.asarray(mc.get("gcmvn_stats", {}).get("mean", np.zeros(80)))
    gcmvn_std = np.asarray(mc.get("gcmvn_stats", {}).get("std", np.ones(80)))
    langs = mc.get("langs", [])
    generator = PretsselGenerator(
        voc_params, voc_cfg, sample_rate=sample_rate,
        lang_to_index={l: i for i, l in enumerate(langs)})

    out = Path(args.output_path)
    (out / "wavs").mkdir(parents=True, exist_ok=True)
    hyps = []
    with open(args.data_file) as f:
        for i, row in enumerate(csv.DictReader(f, delimiter="\t")):
            wav, sr = read_wav(str(Path(args.audio_root_dir) / row["audio"]))
            wav = resample(wav, sr, 16000)
            fbank = fbank_numpy(wav)
            gcmvn = ((fbank - gcmvn_mean[None]) / gcmvn_std[None]).astype(np.float32)
            texts, speech = translator.predict(
                wav, "s2st", args.tgt_lang, duration_factor=args.duration_factor,
                prosody_encoder_input=gcmvn)
            wavs = generator.predict(speech.units, args.tgt_lang, gcmvn[None],
                                     np.array([gcmvn.shape[0]]),
                                     duration_factor=args.duration_factor)
            write_wav(str(out / "wavs" / f"{i}.wav"), wavs[0], sample_rate)
            hyps.append(str(texts[0]))
    with open(out / "hypotheses.txt", "w") as f:
        f.write("\n".join(hyps))
    logger.info("wrote %d hypotheses + wavs to %s", len(hyps), out)


if __name__ == "__main__":
    main()
