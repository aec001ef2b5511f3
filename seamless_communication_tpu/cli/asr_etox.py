"""asr_etox CLI (reference cli/toxicity/etox/asr_etox.py:38-255): transcribe a
TSV manifest of audio files (M4T ASR, or whisper when locally available) and
score each transcript's toxicity with the NLLB word lists."""

from __future__ import annotations

import argparse
import csv
import logging
from pathlib import Path

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("asr_etox")


def main() -> None:
    parser = argparse.ArgumentParser(
        description="ASR-ETOX: toxicity level of speech inputs")
    parser.add_argument("data_file", type=Path,
                        help="input TSV manifest listing audio files")
    parser.add_argument("output_file", type=Path)
    parser.add_argument("--lang", type=str, required=True,
                        help="language of the speech to transcribe")
    parser.add_argument("--audio_root_dir", type=str, default="")
    parser.add_argument("--audio_column", type=str, default="audio")
    parser.add_argument("--model_name", type=str,
                        default="seamlessM4T_v2_large",
                        help="M4T card name, or 'whisper_<size>' for a local "
                             "whisper checkpoint")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--local_hf_path", type=str, default=None)
    parser.add_argument("--etox_dataset", type=str, default=None)
    args, _unknown = parser.parse_known_args()

    from seamless_communication_tpu.audio.wav import read_wav, resample
    from seamless_communication_tpu.cli.etox import _load_checker

    if args.model_name.startswith("whisper_"):
        from seamless_communication_tpu.cli.eval_utils import (
            make_whisper_transcriber,
        )
        transcribe_batch = make_whisper_transcriber(
            args.model_name.split("_", 1)[1], lang=args.lang)
    else:
        from seamless_communication_tpu.cli.eval_utils import (
            make_m4t_transcriber,
        )
        transcribe_batch = make_m4t_transcriber(
            args.model_name, lang=args.lang,
            local_hf_path=args.local_hf_path, batch_size=args.batch_size)

    checker = _load_checker(args.etox_dataset, None, lang=args.lang)

    with open(args.data_file) as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    logger.info("running ASR-ETOX over %d rows", len(rows))

    with open(args.output_file, "w", encoding="utf-8") as outf:
        print("text", "toxicity", "bad_words", sep="\t", file=outf)
        for i in range(0, len(rows), args.batch_size):
            batch = rows[i:i + args.batch_size]
            wavs = []
            for row in batch:
                wav, sr = read_wav(str(Path(args.audio_root_dir)
                                       / row[args.audio_column]))
                wavs.append(resample(wav, sr, 16000))
            for text in transcribe_batch(wavs):
                bad = checker.get_bad_words(text=text, lang=args.lang)
                print(text, len(bad), ",".join(bad), sep="\t", file=outf)
    logger.info("wrote %s", args.output_file)


if __name__ == "__main__":
    main()
