"""Finetune data loading (reference cli/m4t/finetune/dataloader.py, dataset.py):
JSON-lines manifests with {"source": {"audio_local_path"| "text", "lang"},
"target": {"text", "lang", "units"?}} entries -> padded, bucketed jnp batches.

Replaces the fairseq2 DataPipeline with a plain generator; fbank runs on host numpy
(identical math to the device kernel) so the device step is pure compute.
"""

from __future__ import annotations

import json
from typing import Iterator, List

import numpy as np

from seamless_communication_tpu.audio.fbank import fbank_numpy
from seamless_communication_tpu.audio.wav import read_wav, resample
from seamless_communication_tpu.text.nllb import NllbTokenizer


def _bucket(n, step):
    return max(step, -(-n // step) * step)


def read_manifest(path: str) -> List[dict]:
    items = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                items.append(json.loads(line))
    return items


class _Reiterable:
    """Multi-epoch safe wrapper: a fresh generator per iteration (a bare
    generator would silently exhaust after epoch 1 of the trainer loop)."""

    def __init__(self, make):
        self._make = make

    def __iter__(self):
        return self._make()


def manifest_batches(path: str, text_tokenizer: NllbTokenizer, *,
                     batch_size: int = 8, max_frames: int = 1024,
                     max_tokens: int = 128, load_units: bool = False,
                     max_units: int = 512, char_tokenizer=None):
    """Finetune batches: fbank, fbank_lens, prev_tokens, target_tokens,
    target_lens (teacher-forced shift). Re-iterable across epochs.

    ``load_units=True`` (AR-T2U SPEECH_TO_SPEECH finetuning) additionally
    emits prev_units/target_units/unit_lens from each entry's
    ``target.units`` raw unit ids (+4 control offset, bos/eos framing — unit
    vocab bos=0, pad=1, eos=2, unk=3).

    ``load_units=True, char_tokenizer=...`` (NAR-T2U S2S) instead emits
    char_ids/char_counts (host char frontend over the tokenized target text),
    target_durations (the manifest's aligner-derived ``target.char_durations``,
    m4t_prepare_dataset --aligner_pt) and the duration-expanded
    ``target_units`` (+4 offset, pad=1, no bos/eos framing)."""
    return _Reiterable(lambda: _manifest_batches(
        path, text_tokenizer, batch_size=batch_size, max_frames=max_frames,
        max_tokens=max_tokens, load_units=load_units, max_units=max_units,
        char_tokenizer=char_tokenizer))


UNIT_BOS, UNIT_PAD, UNIT_EOS, UNIT_OFFSET = 0, 1, 2, 4


def _manifest_batches(path: str, text_tokenizer: NllbTokenizer, *,
                      batch_size: int = 8, max_frames: int = 1024,
                      max_tokens: int = 128, load_units: bool = False,
                      max_units: int = 512, char_tokenizer=None
                      ) -> Iterator[dict]:
    import jax.numpy as jnp

    nar = load_units and char_tokenizer is not None
    items = read_manifest(path)
    for i in range(0, len(items), batch_size):
        chunk = items[i:i + batch_size]
        feats, flens, tgt_ids, unit_ids = [], [], [], []
        raw_units, durations = [], []
        for it in chunk:
            src = it["source"]
            if "audio_local_path" in src:
                wav, sr = read_wav(src["audio_local_path"])
                wav = resample(wav, sr, 16000)
                f = fbank_numpy(wav)
                f = (f - f.mean()) / (f.std() + 1e-7)
            else:
                raise ValueError("text-source finetuning requires audio manifests")
            feats.append(f[:max_frames])
            flens.append(min(f.shape[0], max_frames))
            tgt = it["target"]
            ids = text_tokenizer.encode_target(tgt["text"], tgt["lang"])
            tgt_ids.append(ids[:max_tokens])
            if load_units:
                raw = tgt.get("units")
                if raw is None:
                    raise ValueError(
                        "SPEECH_TO_SPEECH finetuning needs target.units in "
                        "the manifest (m4t_prepare_dataset --extract_units)")
                if nar:
                    durs = tgt.get("char_durations")
                    if durs is None:
                        raise ValueError(
                            "NAR S2S finetuning needs target.char_durations "
                            "(m4t_prepare_dataset --aligner_pt)")
                    raw_units.append([int(u) for u in raw[:max_units]])
                    durations.append([int(d) for d in durs])
                else:
                    unit_ids.append(
                        [UNIT_BOS]
                        + [int(u) + UNIT_OFFSET for u in raw[:max_units]]
                        + [UNIT_EOS])

        B = len(chunk)
        T = _bucket(max(flens), 128)
        L = _bucket(max(len(t) for t in tgt_ids), 16)
        fb = np.zeros((B, T, 80), np.float32)
        pv = np.full((B, L), text_tokenizer.vocab_info.pad_idx, np.int32)
        tg = np.full((B, L), text_tokenizer.vocab_info.pad_idx, np.int32)
        tl = np.zeros((B,), np.int32)
        for b in range(B):
            fb[b, :flens[b]] = feats[b][:flens[b]]
            ids = tgt_ids[b]
            # teacher forcing: prev = ids[:-1], target = ids[1:]
            pv[b, :len(ids) - 1] = ids[:-1]
            tg[b, :len(ids) - 1] = ids[1:]
            tl[b] = len(ids) - 1
        batch = {"fbank": jnp.asarray(fb),
                 "fbank_lens": jnp.asarray(flens, jnp.int32),
                 "prev_tokens": jnp.asarray(pv), "target_tokens": jnp.asarray(tg),
                 "target_lens": jnp.asarray(tl)}
        if load_units and not nar:
            U = _bucket(max(len(u) for u in unit_ids) - 1, 32)
            pu = np.full((B, U), UNIT_PAD, np.int32)
            tu = np.full((B, U), UNIT_PAD, np.int32)
            ul = np.zeros((B,), np.int32)
            for b, ids in enumerate(unit_ids):
                n = len(ids) - 1
                pu[b, :n] = ids[:-1]
                tu[b, :n] = ids[1:]
                ul[b] = n
            batch.update(prev_units=jnp.asarray(pu),
                         target_units=jnp.asarray(tu),
                         unit_lens=jnp.asarray(ul))
        elif nar:
            from seamless_communication_tpu.text.char_frontend import (
                text_to_char_seqs,
            )
            # char frontend over the PREV positions ([eos, lang, toks...]) —
            # char_counts aligns position-for-position with prev_tokens, the
            # positions whose decoder features the NAR T2U upsamples
            C = _bucket(max(len(d) for d in durations), 64)
            char_ids, char_lens, char_counts = text_to_char_seqs(
                text_tokenizer, char_tokenizer, pv, max_char_len=C)
            td = np.zeros((B, C), np.int32)
            for b, durs in enumerate(durations):
                if len(durs) != int(char_lens[b]):
                    raise ValueError(
                        f"char_durations length {len(durs)} != the char "
                        f"frontend's {int(char_lens[b])} chars for row {b} — "
                        "manifest prepared with a different char tokenizer, "
                        "or max_tokens truncated the text")
                td[b, :len(durs)] = durs
            # cap the unit grid at max_units: the trainer upsamples to
            # target_units.shape[1] frames (max_unit_len), so this bound —
            # not the raw sum of durations — is what bounds activation
            # memory; frames past the cap are UNIT_PAD (excluded from the
            # NLL), consistent with the raw[:max_units] truncation above
            U = _bucket(min(max(sum(d) for d in durations), max_units), 32)
            tu = np.full((B, U), UNIT_PAD, np.int32)
            for b, units in enumerate(raw_units):
                n = min(len(units), sum(durations[b]), U)
                tu[b, :n] = np.asarray(units[:n], np.int32) + UNIT_OFFSET
            batch.update(char_ids=jnp.asarray(char_ids),
                         char_counts=jnp.asarray(char_counts),
                         target_durations=jnp.asarray(td),
                         target_units=jnp.asarray(tu))
        yield batch
