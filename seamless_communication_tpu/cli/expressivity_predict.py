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
    args = parser.parse_args()

    from seamless_communication_tpu.assets import load_card, resolve_asset
    from seamless_communication_tpu.audio.fbank import fbank_numpy
    from seamless_communication_tpu.audio.wav import read_wav, resample, write_wav
    from seamless_communication_tpu.checkpoint.serialize import load_params
    from seamless_communication_tpu.cli.loading import load_unity_model_and_tokenizers
    from seamless_communication_tpu.inference.pretssel_generator import (
        PretsselGenerator,
    )
    from seamless_communication_tpu.inference.translator import Translator
    from seamless_communication_tpu.models.pretssel.vocoder import PretsselConfig

    params, cfg, text_tok, unit_tok, char_tok = load_unity_model_and_tokenizers(
        args.model_name, local_hf_path=args.local_hf_path)
    translator = Translator(params, cfg, text_tok, unit_tok, char_tok)

    voc_card = load_card(args.vocoder_name)
    voc_params = load_params(resolve_asset(voc_card["checkpoint"]))
    voc_cfg = PretsselConfig()
    mc = voc_card.get("model_config") or {}
    gcmvn_mean = np.asarray(mc.get("gcmvn_stats", {}).get("mean", np.zeros(80)))
    gcmvn_std = np.asarray(mc.get("gcmvn_stats", {}).get("std", np.ones(80)))
    langs = voc_card.get("model_config", {}).get("langs", [])
    generator = PretsselGenerator(
        voc_params, voc_cfg, lang_to_index={l: i for i, l in enumerate(langs)})

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
    write_wav(args.output_path, wavs[0], 16000)
    logger.info("Saved expressive waveform to %s", args.output_path)


if __name__ == "__main__":
    main()
