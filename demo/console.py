"""Interactive console demo (the TPU counterpart of the reference's unity.cpp CLI
and gradio demos, reference demo/m4tv2/app.py + ggml/examples/unity/unity.cpp):
type a WAV path or text, get translations/transcriptions back.

Usage:
    python demo/console.py --model seamlessM4T_v2_large --task s2tt --tgt-lang fra
    > /path/to/audio.wav
    > :task asr
    > :lang deu
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser(description="Seamless TPU interactive demo")
    parser.add_argument("--model", default="seamlessM4T_v2_large")
    parser.add_argument("--vocoder", default="vocoder_v2")
    parser.add_argument("--task", default="s2tt")
    parser.add_argument("--tgt-lang", default="eng")
    parser.add_argument("--src-lang", default="eng")
    parser.add_argument("--local-hf-path", default=None)
    parser.add_argument("--out-dir", default="demo_out")
    args = parser.parse_args()

    from pathlib import Path

    from seamless_communication_tpu.audio.wav import write_wav
    from seamless_communication_tpu.cli.loading import (
        load_unity_model_and_tokenizers, load_vocoder,
    )
    from seamless_communication_tpu.inference.translator import (
        Modality, Translator, get_modalities_from_task_str,
    )

    print(f"loading {args.model} ...", flush=True)
    params, cfg, text_tok, unit_tok, char_tok = load_unity_model_and_tokenizers(
        args.model, local_hf_path=args.local_hf_path)
    voc_params = voc_cfg = None
    idx_map: dict = {}
    _, out_mod = get_modalities_from_task_str(args.task)
    if out_mod is Modality.SPEECH:
        voc_params, voc_cfg, idx_map = load_vocoder(args.vocoder,
                                                    local_hf_path=args.local_hf_path)
    tr = Translator(params, cfg, text_tok, unit_tok, char_tok,
                    vocoder_params=voc_params, vocoder_cfg=voc_cfg,
                    lang_spkr_idx_map=idx_map)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(exist_ok=True)

    task, tgt, src = args.task, args.tgt_lang, args.src_lang
    n = 0
    print(f"task={task} tgt={tgt}; enter a WAV path or text "
          f"(':task X', ':lang X', ':src X' to switch, ctrl-d to quit)")
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line.startswith(":task "):
            task = line.split(None, 1)[1]
            print(f"task -> {task}")
            continue
        if line.startswith(":lang "):
            tgt = line.split(None, 1)[1]
            print(f"tgt_lang -> {tgt}")
            continue
        if line.startswith(":src "):
            src = line.split(None, 1)[1]
            print(f"src_lang -> {src}")
            continue
        try:
            texts, speech = tr.predict(line, task, tgt, src_lang=src)
        except Exception as e:  # noqa: BLE001 — interactive loop keeps going
            print(f"error: {e}")
            continue
        print(f"text: {texts[0]}")
        if speech is not None and speech.audio_wavs:
            n += 1
            path = out_dir / f"out_{n}.wav"
            write_wav(str(path), speech.audio_wavs[0], speech.sample_rate)
            print(f"audio: {path} ({len(speech.units[0])} units)")


if __name__ == "__main__":
    main()
