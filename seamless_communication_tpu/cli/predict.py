"""m4t_predict CLI (reference cli/m4t/predict/predict.py:26-256)."""

from __future__ import annotations

import argparse
import logging

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s -- %(name)s: %(message)s")
logger = logging.getLogger("m4t_predict")


def add_inference_arguments(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument("input", type=str, help="audio WAV path or text")
    parser.add_argument("task", type=str,
                        help="s2st | s2tt | t2st | t2tt | asr")
    parser.add_argument("tgt_lang", type=str)
    parser.add_argument("--src_lang", type=str, default=None)
    parser.add_argument("--model_name", type=str, default="seamlessM4T_v2_large")
    parser.add_argument("--vocoder_name", type=str, default="vocoder_v2")
    parser.add_argument("--output_path", type=str, default="out.wav")
    parser.add_argument("--local_hf_path", type=str, default=None,
                        help="local HF checkpoint directory (offline)")
    parser.add_argument("--text_generation_beam_size", type=int, default=5)
    parser.add_argument("--text_generation_max_len_a", type=int, default=1)
    parser.add_argument("--text_generation_max_len_b", type=int, default=200)
    parser.add_argument("--text_unk_blocking", action="store_true")
    parser.add_argument("--text_generation_ngram_blocking", action="store_true",
                        help="block repeated n-grams in text decoding "
                             "(size = --no_repeat_ngram_size)")
    parser.add_argument("--no_repeat_ngram_size", type=int, default=4)
    parser.add_argument("--unit_generation_beam_size", type=int, default=5,
                        help="AR T2U beam (v1 models)")
    parser.add_argument("--unit_generation_max_len_a", type=int, default=25)
    parser.add_argument("--unit_generation_max_len_b", type=int, default=50)
    parser.add_argument("--unit_generation_ngram_blocking", action="store_true")
    parser.add_argument("--unit_generation_ngram_filtering", action="store_true")
    parser.add_argument("--duration_factor", type=float, default=1.0)
    parser.add_argument("--spkr", type=int, default=-1)
    parser.add_argument("--quantize", action="store_true",
                        help="int8 weight-only quantization for faster decode")
    parser.add_argument("--quantize_bits", type=int, default=8,
                        choices=(4, 8),
                        help="weight quantization width with --quantize: 8 "
                             "(default, near-lossless) or 4 (group-128 "
                             "scales; halves weight HBM reads again, "
                             "lossier — see ops/quantization.py)")
    parser.add_argument("--apply_mintox", action="store_true",
                        help="MinTox added-toxicity mitigation (requires "
                             "--etox_dataset)")
    parser.add_argument("--etox_dataset", type=str, default=None,
                        help="local nllb-200_twl.zip (or extracted dir); URL "
                             "in cards/mintox.yaml")
    return parser


def main() -> None:
    parser = argparse.ArgumentParser(
        description="M4T inference: S2ST, S2TT, T2ST, T2TT, ASR")
    add_inference_arguments(parser)
    args = parser.parse_args()

    from seamless_communication_tpu.audio.wav import write_wav
    from seamless_communication_tpu.cli.loading import (
        load_unity_model_and_tokenizers, load_vocoder,
    )
    from seamless_communication_tpu.inference.generator import SequenceGeneratorOptions
    from seamless_communication_tpu.inference.translator import (
        Modality, Translator, get_modalities_from_task_str,
    )

    _, out_mod = get_modalities_from_task_str(args.task)
    params, cfg, text_tok, unit_tok, char_tok = load_unity_model_and_tokenizers(
        args.model_name, local_hf_path=args.local_hf_path,
        quantize=args.quantize, quantize_bits=args.quantize_bits)
    voc_params = voc_cfg = None
    idx_map = {}
    if out_mod is Modality.SPEECH:
        voc_params, voc_cfg, idx_map = load_vocoder(
            args.vocoder_name, local_hf_path=args.local_hf_path)

    opts = SequenceGeneratorOptions(
        beam_size=args.text_generation_beam_size,
        soft_max_seq_len=(args.text_generation_max_len_a,
                          args.text_generation_max_len_b),
        unk_penalty=(1e9 if args.text_unk_blocking else 0.0),
        no_repeat_ngram_size=(args.no_repeat_ngram_size
                              if args.text_generation_ngram_blocking else None))
    unit_opts = SequenceGeneratorOptions(
        beam_size=args.unit_generation_beam_size,
        soft_max_seq_len=(args.unit_generation_max_len_a,
                          args.unit_generation_max_len_b),
        no_repeat_ngram_size=(args.no_repeat_ngram_size
                              if args.unit_generation_ngram_blocking else None))

    checker = None
    if args.apply_mintox:
        if not args.etox_dataset:
            parser.error("--apply_mintox requires --etox_dataset")
        from seamless_communication_tpu.toxicity.etox import load_etox_checker
        checker = load_etox_checker(args.etox_dataset)
    translator = Translator(params, cfg, text_tok, unit_tok, char_tok,
                            vocoder_params=voc_params, vocoder_cfg=voc_cfg,
                            lang_spkr_idx_map=idx_map, text_opts=opts,
                            unit_opts=unit_opts, apply_mintox=args.apply_mintox,
                            etox_checker=checker)
    texts, speech = translator.predict(
        args.input, args.task, args.tgt_lang, src_lang=args.src_lang,
        duration_factor=args.duration_factor, spkr=args.spkr,
        ngram_filtering=args.unit_generation_ngram_filtering)

    logger.info("Translated text: %s", texts[0])
    if speech is not None and speech.audio_wavs:
        write_wav(args.output_path, speech.audio_wavs[0], speech.sample_rate)
        logger.info("Saved waveform to %s", args.output_path)


if __name__ == "__main__":
    main()
