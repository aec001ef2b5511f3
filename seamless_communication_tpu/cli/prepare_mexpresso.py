"""Prepare the mExpresso Eng->XXX expressive S2T evaluation manifests
(reference cli/expressivity/data/prepare_mexpresso.py:73-234): join the
released mExpresso target-text TSVs with the English Expresso read speech,
downsample 48 kHz -> mono 16 kHz, and write per-(subset, lang) TSVs with the
reference's exact column set.

Dependency-light: csv instead of pandas, this framework's WAV IO + polyphase
resampler instead of torchaudio/sox, threads instead of a spawn pool."""

from __future__ import annotations

import argparse
import csv
import logging
import os
import re
import tarfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("prepare_mexpresso")

# the open-sourced styles (reference prepare_mexpresso.py:75-85)
WHITELIST_STYLE = [
    "default", "default_emphasis", "default_essentials", "confused", "happy",
    "sad", "enunciated", "whisper", "laughing",
]
MEXPRESSO_LANGS = ["spa", "fra", "ita", "cmn", "deu"]


def _fetch_dataset(card_name: str, cache_dir: Path) -> Path:
    """Resolve + extract a dataset tar named by an asset card."""
    from seamless_communication_tpu.assets import load_card, resolve_asset

    card = load_card(card_name)
    tar_path = resolve_asset(card["uri"])
    out = cache_dir / Path(tar_path).stem
    if not out.exists():
        logger.info("extracting %s -> %s", tar_path, out)
        with tarfile.open(tar_path) as tf:
            tf.extractall(out)  # noqa: S202 - first-party dataset archives
    return out


def build_en_manifest_from_oss(oss_root: Path, output_folder: Path
                               ) -> List[Dict[str, str]]:
    """English Expresso read speech -> 16 kHz mono wavs + manifest rows
    (reference :73-145)."""
    from seamless_communication_tpu.audio.wav import (
        read_wav, resample, write_wav,
    )

    rows: List[Dict[str, str]] = []
    with open(oss_root / "read_transcriptions.txt") as fin:
        for line in fin:
            uid, text = line.strip().split("\t")
            sps = uid.split("_")
            speaker, style = sps[0], "_".join(sps[1:-1])
            if style not in WHITELIST_STYLE:
                continue
            text = re.sub(r" <.*?>", "", text)
            text = re.sub(r"<.*?> ", "", text)
            orig = (oss_root / "audio_48khz" / "read" / speaker /
                    style.split("_")[0] / "base" / f"{uid}.wav")
            rows.append({"id": uid, "speaker": speaker, "text": text,
                         "orig_audio": str(orig), "label": style})

    missing = [r["orig_audio"] for r in rows
               if not os.path.isfile(r["orig_audio"])]
    assert not missing, f"missing audio: {missing[0]}"

    target_root = output_folder / "audio_16khz_wav"
    target_root.mkdir(parents=True, exist_ok=True)

    def convert(row: Dict[str, str]) -> None:
        out = target_root / row["speaker"] / (row["id"] + ".wav")
        out.parent.mkdir(parents=True, exist_ok=True)
        wav, sr = read_wav(row["orig_audio"])
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        write_wav(str(out), resample(wav, sr, 16000), 16000)
        row["audio"] = str(out)

    logger.info("converting %d files from 48 kHz to mono 16 kHz", len(rows))
    with ThreadPoolExecutor(max_workers=os.cpu_count()) as ex:
        list(ex.map(convert, rows))

    manifest = output_folder / "en_manifest.tsv"
    with open(manifest, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()), delimiter="\t",
                           quoting=csv.QUOTE_NONE)
        w.writeheader()
        w.writerows(rows)
    logger.info("output %d rows to %s", len(rows), manifest)
    return rows


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Prepare mExpresso Eng-XXX S2T manifests")
    parser.add_argument("output_folder", type=lambda p: Path(p).resolve())
    parser.add_argument("--existing-expresso-root", type=str, default=None,
                        help="root containing read_transcriptions.txt and "
                             "audio_48khz if Expresso is already downloaded")
    parser.add_argument("--cache-dir", type=str, default=None)
    args = parser.parse_args()

    cache = Path(args.cache_dir or os.environ.get(
        "SEAMLESS_CACHE", os.path.expanduser("~/.cache/seamless_tpu")))
    cache.mkdir(parents=True, exist_ok=True)

    mexpresso_path = _fetch_dataset("mexpresso_text", cache) / "mexpresso_text"

    if args.existing_expresso_root:
        en_root = Path(args.existing_expresso_root)
    else:
        en_root = _fetch_dataset("expresso", cache) / "expresso"
    en_rows = build_en_manifest_from_oss(
        en_root, args.output_folder / "En_Expresso")
    en_by_id = {r["id"]: r for r in en_rows}

    out_cols = ["id", "src_audio", "src_speaker", "src_text", "src_lang",
                "tgt_text", "tgt_lang", "label"]
    for subset in ["dev", "test"]:
        for lang in MEXPRESSO_LANGS:
            src_tsv = mexpresso_path / f"{subset}_mexpresso_{lang}.tsv"
            with open(src_tsv) as f:
                released = list(csv.DictReader(f, delimiter="\t",
                                               quoting=csv.QUOTE_NONE))
            joined, missing = [], []
            for row in released:
                en = en_by_id.get(row["id"])
                if en is None:
                    missing.append(row["id"])
                    continue
                joined.append({
                    "id": row["id"], "src_audio": en["audio"],
                    "src_speaker": en["speaker"], "src_text": en["text"],
                    "src_lang": "eng", "tgt_text": row["text"],
                    "tgt_lang": lang, "label": en["label"]})
            if missing:
                raise RuntimeError(
                    f"{subset}_mexpresso_{lang}: {len(missing)} released ids "
                    "missing from the built En Expresso manifest (partial "
                    "Expresso download, or style filtered by "
                    f"WHITELIST_STYLE): {missing[:10]}"
                    f"{'...' if len(missing) > 10 else ''}")
            out_path = args.output_folder / f"{subset}_mexpresso_eng_{lang}.tsv"
            with open(out_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=out_cols, delimiter="\t",
                                   quoting=csv.QUOTE_NONE)
                w.writeheader()
                w.writerows(joined)
            logger.info("output %d rows to %s", len(joined), out_path)


if __name__ == "__main__":
    main()
