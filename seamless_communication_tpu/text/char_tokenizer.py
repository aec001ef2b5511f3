"""Character-level SentencePiece tokenizer for the UnitY2 NAR T2U char upsampler
(reference models/unity/char_tokenizer.py; model file spm_char_lang38_tc.model from
cards/seamlessM4T_v2_large.yaml:10).

Same fairseq2 vocab convention as NLLB: pad=0 inserted, spm ids shifted +1.
"""

from __future__ import annotations

from typing import List, Sequence

from seamless_communication_tpu.text.spm import SentencePieceModel
from seamless_communication_tpu.text.nllb import VocabInfo


class CharTokenizer:
    FAIRSEQ_OFFSET = 1

    def __init__(self, spm: SentencePieceModel):
        self.spm = spm
        self.vocab_info = VocabInfo(len(spm) + self.FAIRSEQ_OFFSET)

    @classmethod
    def from_file(cls, path: str) -> "CharTokenizer":
        return cls(SentencePieceModel.from_file(path))

    def encode_chars(self, word: str) -> List[int]:
        """Encode a subword string into per-character ids (no resegmentation:
        each unicode char looked up individually, unknown -> unk)."""
        out = []
        for ch in word:
            pid = self.spm.piece_to_id.get(ch)
            if pid is None or pid == self.spm.unk_id:
                out.append(self.vocab_info.unk_idx)
            else:
                out.append(pid + self.FAIRSEQ_OFFSET)
        return out

    def encode(self, text: str) -> List[int]:
        spm_ids = self.spm.encode(text)
        return [self.vocab_info.unk_idx if i == self.spm.unk_id
                else i + self.FAIRSEQ_OFFSET for i in spm_ids]

    def decode(self, ids: Sequence[int]) -> str:
        return self.spm.decode([int(i) - self.FAIRSEQ_OFFSET for i in ids
                                if int(i) >= 4])
