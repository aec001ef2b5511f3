"""m4t_evaluate CLI (reference cli/m4t/evaluate/evaluate.py:52-516): TSV manifest ->
batched prediction -> BLEU/chrF/WER score files. The fairseq2 DataPipeline becomes a
plain generator with length-bucketed batches; corrupted inputs are NaN-masked and
skipped (reference :205-245, :279-311)."""

from __future__ import annotations

import argparse
import csv
import json
import logging
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("m4t_evaluate")


def read_manifest(path: str, audio_root: str = ""):
    """TSV with columns incl. 'audio' or 'src_text' and 'tgt_text'."""
    with open(path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            yield row


def batched(iterable, n):
    buf = []
    for x in iterable:
        buf.append(x)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def main() -> None:
    parser = argparse.ArgumentParser(description="M4T evaluation")
    parser.add_argument("data_file", type=str, help="TSV manifest")
    parser.add_argument("task", type=str)
    parser.add_argument("tgt_lang", type=str)
    parser.add_argument("--src_lang", type=str, default=None)
    parser.add_argument("--model_name", type=str, default="seamlessM4T_v2_large")
    parser.add_argument("--vocoder_name", type=str, default="vocoder_v2")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--audio_root_dir", type=str, default="")
    parser.add_argument("--output_path", type=str, default="eval_out")
    parser.add_argument("--local_hf_path", type=str, default=None)
    parser.add_argument("--ref_field", type=str, default="tgt_text")
    parser.add_argument("--whisper_model_name", type=str, default=None,
                        help="HF Whisper checkpoint (name or local path) for "
                             "ASR-BLEU comparable to the reference's published "
                             "numbers (reference evaluate.py:428); falls back "
                             "to this framework's own ASR when unset/missing")
    parser.add_argument("--compute_asr_bleu", action="store_true",
                        help="for speech output: transcribe synthesized audio with "
                             "this framework's own ASR and score BLEU vs refs "
                             "(reference uses Whisper; hook a custom transcriber "
                             "via eval_utils.compute_asr_bleu)")
    args = parser.parse_args()

    from seamless_communication_tpu.audio.wav import read_wav, resample, write_wav
    from seamless_communication_tpu.cli.eval_utils import compute_quality_metrics
    from seamless_communication_tpu.cli.loading import (
        load_unity_model_and_tokenizers, load_vocoder,
    )
    from seamless_communication_tpu.inference.translator import (
        Modality, Translator, get_modalities_from_task_str,
    )

    in_mod, out_mod = get_modalities_from_task_str(args.task)
    params, cfg, text_tok, unit_tok, char_tok = load_unity_model_and_tokenizers(
        args.model_name, local_hf_path=args.local_hf_path)
    voc_params = voc_cfg = None
    idx_map = {}
    if out_mod is Modality.SPEECH:
        voc_params, voc_cfg, idx_map = load_vocoder(
            args.vocoder_name, local_hf_path=args.local_hf_path)
    translator = Translator(params, cfg, text_tok, unit_tok, char_tok,
                            vocoder_params=voc_params, vocoder_cfg=voc_cfg,
                            lang_spkr_idx_map=idx_map)

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    hyps, refs = [], []
    wav_dir = out_dir / "wavs"
    # native C++ loader: threaded wav->fbank extraction prefetched off the
    # TPU critical path (native/dataloader.cpp); falls back to the Python
    # read_wav+fbank path when the toolchain/library is unavailable
    native_batches = None
    if in_mod is Modality.SPEECH:
        try:
            from seamless_communication_tpu.inference.translator import FbankInput
            from seamless_communication_tpu.native import NativeFbankLoader

            rows = list(read_manifest(args.data_file, args.audio_root_dir))
            paths = [str(Path(args.audio_root_dir) / r["audio"]) for r in rows]
            loader = NativeFbankLoader(paths, batch_size=args.batch_size)
            native_batches = zip(batched(iter(rows), args.batch_size), loader)
            logger.info("using native data loader (%d files)", len(paths))
        except (RuntimeError, KeyError):
            native_batches = None

    def _speech_batches():
        if native_batches is not None:
            for batch, (fb, lens) in native_batches:
                yield batch, FbankInput(fbank=fb, lengths=lens)
            return
        for batch in batched(read_manifest(args.data_file, args.audio_root_dir),
                             args.batch_size):
            wavs = []
            for r in batch:
                w, sr = read_wav(str(Path(args.audio_root_dir) / r["audio"]))
                wavs.append(resample(w, sr, 16000))
            yield batch, wavs

    batch_iter = (_speech_batches() if in_mod is Modality.SPEECH else
                  ((b, None) for b in batched(
                      read_manifest(args.data_file, args.audio_root_dir),
                      args.batch_size)))
    for batch, speech_input in batch_iter:
        refs.extend(r.get(args.ref_field, "") for r in batch)
        try:
            if in_mod is Modality.SPEECH:
                texts, speech = translator.predict(speech_input, args.task,
                                                   args.tgt_lang,
                                                   src_lang=args.src_lang)
                if isinstance(speech_input, FbankInput):
                    # corrupted inputs (length 0) -> empty hypotheses
                    # (reference evaluate.py:205-245)
                    texts = ["" if speech_input.lengths[i] == 0 else t
                             for i, t in enumerate(texts)]
            else:
                texts, speech = translator.predict(
                    [r["src_text"] for r in batch], args.task, args.tgt_lang,
                    src_lang=args.src_lang)
        except RuntimeError as e:  # corrupted input handling (reference :297-311)
            logger.warning("batch failed (%s); emitting empty hypotheses", e)
            texts, speech = [""] * len(batch), None
        hyps.extend(str(t) for t in texts)
        if speech is not None:
            wav_dir.mkdir(exist_ok=True)
            for i, w in enumerate(speech.audio_wavs):
                write_wav(str(wav_dir / f"{len(hyps) - len(batch) + i}.wav"), w,
                          speech.sample_rate)

    with open(out_dir / "hypotheses.txt", "w") as f:
        f.write("\n".join(hyps))
    if out_mod is Modality.TEXT:
        metrics = compute_quality_metrics(
            hyps, refs, lang=args.tgt_lang, task=args.task,
            output_path=str(out_dir / f"{args.task}_scores.json"))
        logger.info("metrics: %s", json.dumps(metrics))
    elif args.compute_asr_bleu:
        # ASR-BLEU on the synthesized waveforms: Whisper when a checkpoint is
        # reachable (reference-comparable numbers), else this framework's ASR
        from seamless_communication_tpu.cli.eval_utils import compute_asr_bleu

        wavs = []
        for i in range(len(hyps)):
            p = wav_dir / f"{i}.wav"
            if p.exists():
                w, sr = read_wav(str(p))
                wavs.append(resample(w, sr, 16000))
            else:
                wavs.append(np.zeros(400, np.float32))

        transcribe = None
        asr_kind = "whisper"
        if args.whisper_model_name:
            try:
                from seamless_communication_tpu.cli.eval_utils import (
                    make_whisper_transcriber,
                )
                transcribe = make_whisper_transcriber(args.whisper_model_name,
                                                      lang=args.tgt_lang)
            except Exception as exc:  # no weights / no net: fall back
                logger.warning("whisper unavailable (%s); using own ASR", exc)
        if transcribe is None:
            from seamless_communication_tpu.inference.transcriber import Transcriber
            asr = Transcriber(params, cfg, text_tok)
            asr_kind = "own_asr"

            def transcribe(batch):
                return [asr.transcribe(w, args.tgt_lang).text for w in batch]

        score = compute_asr_bleu(wavs, refs, transcribe=transcribe,
                                 lang=args.tgt_lang)
        with open(out_dir / "s2st_asr_bleu.json", "w") as f:
            json.dump({"asr_bleu": score, "asr": asr_kind}, f)
        logger.info("ASR-BLEU (%s): %.2f", asr_kind, score)


if __name__ == "__main__":
    main()
