"""etox CLI (reference cli/toxicity/etox/etox.py:13-43): score the toxicity of
text lines (STDIN > STDOUT) with the NLLB toxicity word lists."""

from __future__ import annotations

import argparse
import sys


def _load_checker(dataset: str | None, sp_model: str | None,
                  lang: str | None = None):
    from seamless_communication_tpu.assets import load_card, resolve_asset
    from seamless_communication_tpu.toxicity.etox import (
        SP_LANGS, load_etox_checker,
    )

    card = load_card("mintox")
    dataset = dataset or card["etox_dataset"]
    sp_model = sp_model or card.get("sp_model")
    # only the SP_LANGS set ever consults the SP model — don't force a
    # (possibly remote) resolution for languages that match on word boundaries
    if lang is not None and lang not in SP_LANGS:
        sp_model = None
    sp_path = resolve_asset(sp_model) if sp_model else None
    return load_etox_checker(resolve_asset(dataset), sp_model_path=sp_path)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="ETOX: compute the toxicity level of text inputs "
                    "(STDIN > STDOUT)")
    parser.add_argument("lang", type=str,
                        help="language of the text lines")
    parser.add_argument("input", nargs="?", type=argparse.FileType("r"),
                        default=sys.stdin)
    parser.add_argument("output", nargs="?", type=argparse.FileType("w"),
                        default=sys.stdout)
    parser.add_argument("--etox_dataset", type=str, default=None,
                        help="path/URL of the nllb-200_twl word lists "
                             "(default: cards/mintox.yaml)")
    parser.add_argument("--sp_model", type=str, default=None)
    args, _unknown = parser.parse_known_args()

    checker = _load_checker(args.etox_dataset, args.sp_model, lang=args.lang)

    print("text", "toxicity", "bad_words", sep="\t", file=args.output)
    for line in args.input:
        text = line.rstrip("\n")
        bad_words = checker.get_bad_words(text=text, lang=args.lang)
        print(text, len(bad_words), ",".join(bad_words), sep="\t",
              file=args.output)


if __name__ == "__main__":
    main()
