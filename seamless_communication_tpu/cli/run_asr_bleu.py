"""run_asr_bleu CLI (reference cli/expressivity/evaluate/run_asr_bleu.py:15-29):
score an expressive-generation directory (hypotheses.txt + wavs/ from
expressivity_evaluate) with ASR-BLEU — whisper when a local checkpoint is
available, else this framework's own M4T ASR."""

from __future__ import annotations

import argparse
import csv
import json
import logging
from pathlib import Path

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("run_asr_bleu")


def main() -> None:
    parser = argparse.ArgumentParser(description="ASR-BLEU over generated wavs")
    parser.add_argument("generation_dir", type=str,
                        help="expressivity_evaluate output dir (wavs/ + "
                             "hypotheses.txt)")
    parser.add_argument("data_file", type=str,
                        help="the eval TSV with the tgt_text references")
    parser.add_argument("--tgt_lang", type=str, required=True)
    parser.add_argument("--whisper_model", type=str, default=None,
                        help="local HF whisper checkpoint; default falls back "
                             "to this framework's M4T ASR")
    parser.add_argument("--asr_model_name", type=str,
                        default="seamlessM4T_v2_large")
    parser.add_argument("--local_hf_path", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()

    from seamless_communication_tpu.audio.wav import read_wav, resample
    from seamless_communication_tpu.cli.eval_utils import compute_asr_bleu

    gen = Path(args.generation_dir)
    with open(args.data_file) as f:
        refs = [row["tgt_text"] for row in csv.DictReader(f, delimiter="\t")]
    wavs = []
    for i in range(len(refs)):
        wav, sr = read_wav(str(gen / "wavs" / f"{i}.wav"))
        wavs.append(resample(wav, sr, 16000))

    transcribe = None
    if not args.whisper_model:
        from seamless_communication_tpu.cli.eval_utils import (
            make_m4t_transcriber,
        )
        transcribe = make_m4t_transcriber(args.asr_model_name,
                                          lang=args.tgt_lang,
                                          local_hf_path=args.local_hf_path)

    score = compute_asr_bleu(wavs, refs, transcribe=transcribe,
                             whisper_model_name=args.whisper_model,
                             lang=args.tgt_lang)
    result = {"asr_bleu": score, "num_utterances": len(refs)}
    print(json.dumps(result))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
