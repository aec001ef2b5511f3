"""mutox_speech CLI (reference cli/toxicity/mutox/mutox_speech.py:27-140):
score a toxicity logit per audio file listed on STDIN (one path per line,
paths > STDOUT scores). SONAR speech embeddings come from the ``sonar``
package when installed, or a TorchScript export via --sonar_torchscript."""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser(
        description="MuToX speech toxicity scores (audio paths on STDIN)")
    parser.add_argument("lang", type=str,
                        help="language of the speech (SONAR encoder choice), "
                             "e.g. eng")
    parser.add_argument("input", nargs="?", type=argparse.FileType("r"),
                        default=sys.stdin)
    parser.add_argument("output", nargs="?", type=argparse.FileType("w"),
                        default=sys.stdout)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--classifier_pt", type=str, required=True,
                        help="the reference mutox.pt classifier checkpoint")
    parser.add_argument("--sonar_torchscript", type=str, default=None,
                        help="TorchScript SONAR speech encoder; default uses "
                             "the sonar package's sonar_speech_encoder_<lang>")
    args, _unknown = parser.parse_known_args()

    from seamless_communication_tpu.audio.wav import read_wav, resample
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        load_pt_state_dict, mutox_tree_from_pt,
    )
    from seamless_communication_tpu.toxicity.mutox import MutoxClassifier
    from seamless_communication_tpu.toxicity.mutox_speech import (
        MutoxSpeechPipeline, sonar_package_embedder,
        sonar_torchscript_embedder,
    )

    classifier = MutoxClassifier(
        mutox_tree_from_pt(load_pt_state_dict(args.classifier_pt)))
    embedder = (sonar_torchscript_embedder(args.sonar_torchscript)
                if args.sonar_torchscript
                else sonar_package_embedder(
                    f"sonar_speech_encoder_{args.lang}"))
    pipeline = MutoxSpeechPipeline(classifier, embedder)

    paths = [line.strip() for line in args.input if line.strip()]
    print("path", "score", sep="\t", file=args.output)
    for i in range(0, len(paths), args.batch_size):
        batch = paths[i:i + args.batch_size]
        wavs = []
        for p in batch:
            wav, sr = read_wav(p)
            wavs.append(resample(wav, sr, 16000))
        scores = pipeline.predict(wavs, batch_size=args.batch_size)
        for p, s in zip(batch, scores):
            print(p, float(s), sep="\t", file=args.output)


if __name__ == "__main__":
    main()
