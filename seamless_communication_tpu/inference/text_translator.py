"""Standalone NLLB text-translation model (the counterpart of the reference's
bitext ggml/mt.py:1-182: NLLB-only builder/loader for text-to-text serving).

Wraps models/nllb with the compiled beam search — usable without any speech
components for pure MT deployments.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.inference.generator import (
    SequenceGeneratorOptions, _bucket,
)
from seamless_communication_tpu.models.nllb.model import (
    NllbConfig, text_decoder_cache, text_decoder_step, text_encoder_forward,
)
from seamless_communication_tpu.ops.beam_search import BeamSearchOptions, beam_search
from seamless_communication_tpu.text.nllb import NllbTokenizer


class TextTranslator:
    """T2TT-only pipeline over an NLLB encoder/decoder parameter pair."""

    def __init__(self, enc_params: dict, dec_params: dict, cfg: NllbConfig,
                 tokenizer: NllbTokenizer,
                 opts: Optional[SequenceGeneratorOptions] = None):
        self.enc_params = enc_params
        self.dec_params = dec_params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.opts = opts or SequenceGeneratorOptions()
        self._jit: dict = {}

    def _run_fn(self, max_len: int):
        if max_len not in self._jit:
            K = self.opts.beam_size
            opts = BeamSearchOptions(
                beam_size=K, max_len=max_len, len_penalty=self.opts.len_penalty,
                unk_penalty=self.opts.unk_penalty, pad_idx=self.cfg.pad_idx,
                unk_idx=self.cfg.unk_idx, eos_idx=self.cfg.eos_idx)

            def run(enc_p, dec_p, ids, lens, prefix):
                from seamless_communication_tpu.ops.transformer import (
                    unstack_layer_params,
                )

                enc_out, _ = text_encoder_forward(enc_p, ids, lens, self.cfg)
                enc_bk = jnp.repeat(enc_out, K, axis=0)
                mask = jnp.repeat(
                    jnp.arange(ids.shape[1])[None, :] < lens[:, None], K, axis=0)
                # hoist layer weight slices out of the decode while-loop
                dec_p = dict(dec_p)
                dec_p["stack"] = unstack_layer_params(dec_p["stack"])

                def step_fn(tok_t, cache, step, beam_src=None):
                    return text_decoder_step(dec_p, tok_t, cache, step, self.cfg,
                                             enc_padding_mask=mask,
                                             beam_src=beam_src)

                cache = text_decoder_cache(dec_p, self.cfg, enc_bk, max_len)
                return beam_search(step_fn, cache, prefix,
                                   jnp.full((ids.shape[0],), 2, jnp.int32), opts,
                                   self.cfg.vocab_size, src_to_step=True)

            self._jit[max_len] = jax.jit(run)
        return self._jit[max_len]

    def translate(self, texts: Sequence[str], src_lang: str, tgt_lang: str
                  ) -> List[str]:
        ids_list = [self.tokenizer.encode_source(t, src_lang) for t in texts]
        lens = np.array([len(i) for i in ids_list], np.int32)
        T = _bucket(int(lens.max()), 16)
        arr = np.full((len(texts), T), self.cfg.pad_idx, np.int32)
        for i, s in enumerate(ids_list):
            arr[i, :len(s)] = s
        a, b = self.opts.soft_max_seq_len
        max_len = _bucket(min(self.opts.hard_max_seq_len, a * T + b))
        prefix = np.tile(self.tokenizer.target_prefix(tgt_lang), (len(texts), 1))
        res = self._run_fn(max_len)(self.enc_params, self.dec_params,
                                    jnp.asarray(arr), jnp.asarray(lens),
                                    jnp.asarray(prefix))
        out = []
        for i in range(len(texts)):
            L = int(res.lengths[i, 0])
            out.append(self.tokenizer.decode(np.asarray(res.tokens[i, 0, :L])))
        return out