"""expressivity_predict CLI (reference cli/expressivity/predict/predict.py:56-179):
SeamlessExpressive S2ST with PRETSSEL — utterance fbank + per-utterance CMVN, gcmvn
fbank as prosody input, duration_factor control."""

from __future__ import annotations

import argparse
import logging

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("expressivity_predict")


def main() -> None:
    parser = argparse.ArgumentParser(description="SeamlessExpressive inference")
    parser.add_argument("input", type=str, help="audio WAV path")
    parser.add_argument("--tgt_lang", type=str, required=True)
    parser.add_argument("--model_name", type=str, default="seamless_expressivity")
    parser.add_argument("--vocoder_name", type=str, default="vocoder_pretssel")
    parser.add_argument("--output_path", type=str, default="out.wav")
    parser.add_argument("--duration_factor", type=float, default=1.0)
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

    wav, sr = read_wav(args.input)
    wav = resample(wav, sr, 16000)
    fbank = fbank_numpy(wav)
    # dual normalization (reference evaluate.py:92-97): per-utterance CMVN for the
    # translator; gcmvn for the prosody input
    ucmvn = ((fbank - fbank.mean()) / (fbank.std() + 1e-7)).astype(np.float32)
    gcmvn = ((fbank - gcmvn_mean[None]) / gcmvn_std[None]).astype(np.float32)

    texts, speech = translator.predict(wav, "s2st", args.tgt_lang,
                                       duration_factor=args.duration_factor,
                                       prosody_encoder_input=gcmvn)
    logger.info("Translated text: %s", texts[0])
    wavs = generator.predict(speech.units, args.tgt_lang, gcmvn[None],
                             np.array([gcmvn.shape[0]]),
                             duration_factor=args.duration_factor)
    write_wav(args.output_path, wavs[0], sample_rate)
    logger.info("Saved expressive waveform to %s", args.output_path)


if __name__ == "__main__":
    main()
