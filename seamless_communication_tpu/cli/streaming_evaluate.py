"""streaming_evaluate CLI (reference cli/streaming/evaluate.py:33-104): run the
SeamlessStreaming agent pipelines over a TSV of audio + references, report AL/LAAL
(S2TT) or StartOffset/EndOffset (S2ST) and quality."""

from __future__ import annotations

import argparse
import csv
import json
import logging
from pathlib import Path

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("streaming_evaluate")


def main() -> None:
    parser = argparse.ArgumentParser(description="SeamlessStreaming evaluation")
    parser.add_argument("--data-file", type=str, required=True,
                        help="TSV with 'audio' and 'tgt_text' columns")
    parser.add_argument("--audio-root-dir", type=str, default="")
    parser.add_argument("--task", type=str, default="s2st",
                        choices=["s2st", "s2tt", "asr"])
    parser.add_argument("--tgt-lang", type=str, default="eng")
    parser.add_argument("--unity-name", type=str, default="seamless_streaming_unity")
    parser.add_argument("--monotonic-name", type=str,
                        default="seamless_streaming_monotonic_decoder")
    parser.add_argument("--vocoder-name", type=str, default="vocoder_v2")
    parser.add_argument("--source-segment-size", type=int, default=320)
    parser.add_argument("--decision-threshold", type=float, default=0.5)
    parser.add_argument("--min-starting-wait-w2vbert", type=int, default=192)
    parser.add_argument("--min-unit-chunk-size", type=int, default=50)
    parser.add_argument("--output", type=str, default="streaming_eval")
    parser.add_argument("--compute-asr-bleu", action="store_true",
                        help="transcribe the emitted speech with a separately "
                             "loaded M4T ASR model and report ASR-BLEU vs "
                             "tgt_text (reference seamless_quality_scorer)")
    parser.add_argument("--asr-model-name", type=str,
                        default="seamlessM4T_v2_large")
    parser.add_argument("--expressive", action="store_true",
                        help="expressive S2ST: synthesize through the gated "
                             "PRETSSEL vocoder (prosody from the source "
                             "audio) instead of the unit HiFi-GAN; use "
                             "--vocoder-name vocoder_pretssel[_16khz]")
    parser.add_argument("--local-hf-path", type=str, default=None)
    parser.add_argument("--gated-model-dir", type=str, default=None,
                        help="dir with gated checkpoints (m2m_expressive_unity.pt, pretssel_melhifigan_wm*.pt); sets SEAMLESS_GATED_ASSETS")
    parser.add_argument("--no-strip-silence", action="store_true",
                        help="keep leading/trailing silence. By default each "
                             "utterance is VAD-trimmed to [first speech, last "
                             "speech) before evaluation, matching the "
                             "reference streaming dataloader (s2tt.py:48-81)")
    parser.add_argument("--silero-model", type=str, default=None,
                        help="TorchScript silero-vad model path for the "
                             "silence stripper (default: built-in energy VAD)")
    args = parser.parse_args()
    if args.gated_model_dir:
        import os
        os.environ["SEAMLESS_GATED_ASSETS"] = args.gated_model_dir

    from seamless_communication_tpu.audio.wav import read_wav, resample
    from seamless_communication_tpu.cli.loading import (
        load_monotonic_decoder, load_unity_model_and_tokenizers, load_vocoder,
    )
    from seamless_communication_tpu.streaming.evaluator import evaluate_streaming
    from seamless_communication_tpu.streaming.pipeline import (
        build_s2st_pipeline, build_s2t_pipeline,
    )

    unity_params, unity_cfg, text_tok, unit_tok, char_tok = \
        load_unity_model_and_tokenizers(args.unity_name,
                                        local_hf_path=args.local_hf_path)
    # original EMMA .pt (fairseq1 keyed) converts in load_monotonic_decoder
    mono_params, mono_cfg = load_monotonic_decoder(args.monotonic_name)

    stripper = None
    if not args.no_strip_silence:
        from seamless_communication_tpu.segment.vad import (
            make_silero_probs_fn, strip_silence,
        )
        probs_fn = (make_silero_probs_fn(args.silero_model)
                    if args.silero_model else None)
        stripper = lambda w: strip_silence(w, probs_fn=probs_fn)
        print("stripping leading/trailing silence from each utterance "
              "(--no-strip-silence to keep)")

    wavs, refs = [], []
    with open(args.data_file) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            w, sr = read_wav(str(Path(args.audio_root_dir) / row["audio"]))
            w = resample(w, sr, 16000)
            wavs.append(stripper(w) if stripper is not None else w)
            refs.append(row.get("tgt_text", ""))


    transcribe = None
    if args.compute_asr_bleu and args.task == "s2st":
        # the streaming UnitY checkpoint has no text decoder; the quality
        # scorer loads a full M4T model for ASR (reference
        # seamless_quality_scorer.py:24-136); batched so a large eval set
        # never pads into one giant device batch
        from seamless_communication_tpu.cli.eval_utils import (
            make_m4t_transcriber,
        )
        transcribe = make_m4t_transcriber(args.asr_model_name,
                                          lang=args.tgt_lang,
                                          local_hf_path=args.local_hf_path)

    if args.task in ("s2tt", "asr"):
        def factory():
            return build_s2t_pipeline(
                unity_params, unity_cfg, mono_params, mono_cfg, text_tok,
                tgt_lang=args.tgt_lang,
                min_starting_wait_w2vbert=args.min_starting_wait_w2vbert,
                decision_threshold=args.decision_threshold)
        metrics = evaluate_streaming(factory, wavs, references=refs,
                                     tgt_lang=args.tgt_lang,
                                     segment_size_ms=args.source_segment_size)
    elif args.expressive:
        import numpy as np
        from seamless_communication_tpu.cli.loading import load_pretssel_vocoder
        from seamless_communication_tpu.streaming.pipeline import (
            build_expressive_s2st_pipeline,
        )
        voc_name = (args.vocoder_name if "pretssel" in args.vocoder_name
                    else "vocoder_pretssel")
        voc_params, voc_cfg, mc, voc_sr = load_pretssel_vocoder(voc_name)
        gcmvn_mean = np.asarray(
            mc.get("gcmvn_stats", {}).get("mean", np.zeros(80)), np.float32)
        gcmvn_std = np.asarray(
            mc.get("gcmvn_stats", {}).get("std", np.ones(80)), np.float32)
        langs = mc.get("langs", [])

        def factory():
            return build_expressive_s2st_pipeline(
                unity_params, unity_cfg, mono_params, mono_cfg, text_tok,
                unit_tok, char_tok, voc_params, voc_cfg,
                {l: i for i, l in enumerate(langs)}, gcmvn_mean, gcmvn_std,
                sample_rate=voc_sr, tgt_lang=args.tgt_lang,
                min_starting_wait_w2vbert=args.min_starting_wait_w2vbert,
                decision_threshold=args.decision_threshold,
                min_unit_chunk_size=args.min_unit_chunk_size)
        metrics = evaluate_streaming(factory, wavs, references=refs,
                                     tgt_lang=args.tgt_lang,
                                     segment_size_ms=args.source_segment_size,
                                     output_is_speech=True,
                                     transcribe=transcribe)
    else:
        voc_params, voc_cfg, idx_map = load_vocoder(
            args.vocoder_name, local_hf_path=args.local_hf_path)

        def factory():
            return build_s2st_pipeline(
                unity_params, unity_cfg, mono_params, mono_cfg, text_tok,
                unit_tok, char_tok, voc_params, voc_cfg, idx_map,
                tgt_lang=args.tgt_lang,
                min_starting_wait_w2vbert=args.min_starting_wait_w2vbert,
                decision_threshold=args.decision_threshold,
                min_unit_chunk_size=args.min_unit_chunk_size)
        metrics = evaluate_streaming(factory, wavs, references=refs,
                                     tgt_lang=args.tgt_lang,
                                     segment_size_ms=args.source_segment_size,
                                     output_is_speech=True,
                                     transcribe=transcribe)

    Path(args.output).mkdir(parents=True, exist_ok=True)
    with open(Path(args.output) / "metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)
    logger.info("metrics: %s", json.dumps(metrics))


if __name__ == "__main__":
    main()
