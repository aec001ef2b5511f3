"""mutox_text CLI (reference cli/toxicity/mutox/mutox_text.py:24-98): score a
toxicity logit for each input text line (STDIN > STDOUT). Text embeddings come
from Meta's SONAR text encoder — the ``sonar`` package when installed (the
reference's own dependency posture) or a TorchScript export via
--sonar_torchscript."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(
        description="MuToX text toxicity scores (STDIN > STDOUT)")
    parser.add_argument("lang", type=str,
                        help="language of the input text, nllb format with "
                             "script (e.g. eng_Latn)")
    parser.add_argument("input", nargs="?", type=argparse.FileType("r"),
                        default=sys.stdin)
    parser.add_argument("output", nargs="?", type=argparse.FileType("w"),
                        default=sys.stdout)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--classifier_pt", type=str, required=True,
                        help="the reference mutox.pt classifier checkpoint")
    parser.add_argument("--sonar_torchscript", type=str, default=None,
                        help="TorchScript SONAR TEXT encoder (texts -> "
                             "(B,1024)); default uses the sonar package")
    args, _unknown = parser.parse_known_args()

    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        load_pt_state_dict, mutox_tree_from_pt,
    )
    from seamless_communication_tpu.toxicity.mutox import MutoxClassifier

    classifier = MutoxClassifier(
        mutox_tree_from_pt(load_pt_state_dict(args.classifier_pt)))

    if args.sonar_torchscript:
        import torch

        model = torch.jit.load(args.sonar_torchscript, map_location="cpu")
        model.eval()

        def embed(texts):
            with torch.no_grad():
                return model(list(texts)).cpu().numpy()
    else:
        from sonar.inference_pipelines.text import (  # reference dependency
            TextToEmbeddingModelPipeline,
        )

        pipe = TextToEmbeddingModelPipeline(
            encoder="text_sonar_basic_encoder",
            tokenizer="text_sonar_basic_encoder")

        def embed(texts):
            return pipe.predict(list(texts),
                                source_lang=args.lang).cpu().numpy()

    def write_result(batch):
        scores = np.asarray(classifier.predict(None, lambda _: embed(batch)))
        for text, s in zip(batch, scores):
            print(text, float(s), sep="\t", file=args.output)

    print("text", "score", sep="\t", file=args.output)
    batch = []
    for line in args.input:
        batch.append(line.rstrip("\n"))
        if len(batch) >= args.batch_size:
            write_result(batch)
            batch = []
    if batch:
        write_result(batch)


if __name__ == "__main__":
    main()
