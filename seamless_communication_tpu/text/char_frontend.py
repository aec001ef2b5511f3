"""Host-side text->char preprocessing for the UnitY2 NAR T2U decoder.

Re-expresses the reference's per-subword Python loops
(models/unity/nar_decoder_frontend.py:130-259: ``indices_to_subwords``,
``count_character_length_in_subword``, ``get_char_seqs``) as a tokenizer-layer
function so device code only sees integer ``char_ids`` / ``char_counts`` arrays
(SURVEY.md §7.5).

Rules (merge_space_with_prev_subword=False, the default):
  - target-mode text seq [eos, lang, t1..tn, eos]: lang/eos positions get 0 chars
  - <unk> counts as 1 char (char id = unk)
  - a single-char punctuation subword absorbs the following subword's leading space
    (count += 1); the subword after a punctuation mark loses its leading space
    (count -= 1)
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer

SPACE = "▁"


def _is_punc(sub: str) -> bool:
    return len(sub) == 1 and not sub.isalpha() and not sub.isnumeric() and sub != SPACE


def text_to_char_seqs(text_tokenizer: NllbTokenizer, char_tokenizer: CharTokenizer,
                      text_seqs: np.ndarray, *, max_char_len: int
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(B, T) target-mode token ids ([eos, lang, ..., eos], right-padded with pad) ->
    (char_ids (B, max_char_len), char_seq_lens (B,), char_counts (B, T)).

    ``char_counts`` uses the reference's SHIFTED (teacher-forcing) alignment
    (TagManager.postprocess_dur_or_len, nar_decoder_frontend.py:44-48 pads
    ``[0, counts(gen), 0]`` around the stripped-prefix counts, pairing the
    char count of token t_i with the decoder feature at position i-1 — the
    feature that PREDICTED t_i; HF transformers replicates it,
    modeling_seamless_m4t_v2.py generate's ``torch.cat([pad_zero, ...])``).
    Zeros land at the leading EOS position and the final feature position;
    cross-checked end-to-end vs hf generate in
    tests/integration/test_hf_conversion.py::test_t2u_chain_matches_hf.
    """
    pad = text_tokenizer.vocab_info.pad_idx
    unk = text_tokenizer.vocab_info.unk_idx
    eos = text_tokenizer.vocab_info.eos_idx
    B, T = text_seqs.shape

    char_counts = np.zeros((B, T), np.int32)
    char_ids = np.full((B, max_char_len), char_tokenizer.vocab_info.pad_idx, np.int32)
    char_seq_lens = np.zeros((B,), np.int32)

    for b in range(B):
        # strip [eos, lang] prefix; treat EOS as pad (reference TagManager)
        core = [int(t) for t in text_seqs[b, 2:]]
        core = [pad if t == eos else t for t in core]
        n = next((i for i, t in enumerate(core) if t == pad), len(core))
        toks = core[:n]
        subs = [text_tokenizer.id_to_token(t) if t != unk else "<unk>" for t in toks]

        next_space = [len(subs[i + 1]) > 1 and subs[i + 1][0] == SPACE
                      if i < len(subs) - 1 else False for i in range(len(subs))]
        punc = [_is_punc(s) for s in subs]

        counts: List[int] = []
        all_chars: List[int] = []
        for i, (tid, sub) in enumerate(zip(toks, subs)):
            if tid == unk:
                c = 1
                ids = [unk]
            else:
                c = len(sub)
                if punc[i] and next_space[i]:
                    c += 1
                elif i > 0 and punc[i - 1] and next_space[i - 1]:
                    c -= 1
                ids = char_tokenizer.encode_chars(sub)
            counts.append(c)
            all_chars.extend(ids)

        # shifted alignment: count of t_i sits on the feature of position
        # i-1 -> [eos(0), lang<-c(t1), t1<-c(t2), ..., t_{n-1}<-c(t_n),
        # t_n<-0, pads(0)]
        char_counts[b, 1:1 + len(counts)] = counts
        total = min(len(all_chars), max_char_len)
        char_ids[b, :total] = all_chars[:total]
        char_seq_lens[b] = total

    return char_ids, char_seq_lens, char_counts
