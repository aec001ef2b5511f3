"""Beam search compiled to a single XLA program.

Re-expresses the fairseq2 ``BeamSearchSeq2SeqGenerator`` (semantics spec:
reference ggml/examples/unity/fairseq2.cpp:1371-1609 ``generate_sequence``; options at
inference/generator.py:59-84) as a fixed-shape ``lax.while_loop``:

  - beam_size K, candidate set 2K per step (fairseq topk trick, fairseq2.cpp:1249)
  - prefix forcing (target language control tokens)
  - length penalty: finalized score = sum_lprob / ((len + 1) ** len_penalty)
    (fairseq2 StandardBeamSearchAlgorithm normalization at finalize time)
  - unk penalty subtracted from the unk lprob each step
  - min/max generation lengths; EOS forced at the hard max
  - step processors (n-gram repeat block, banned sequences) as pure
    ``(tokens, step, lprobs) -> lprobs`` functions
  - early stop when no continuation's best achievable normalized score can beat
    the worst finalized hypothesis on every batch row

The decoder is abstracted as ``step_fn(tok_t, cache, step) -> (logits, cache)`` over a
flattened (B*K) batch; cache is an arbitrary pytree with leading dim B*K that gets
gathered on beam reorder.
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

NEG_INF = -1e9


class BeamSearchOptions(NamedTuple):
    beam_size: int = 5
    max_len: int = 256            # hard cap incl. prefix (static shape)
    min_len: int = 1              # min generated tokens before EOS allowed
    len_penalty: float = 1.0
    unk_penalty: float = 0.0
    pad_idx: int = 0
    unk_idx: int = 1
    bos_idx: int = 2
    eos_idx: int = 3


class BeamSearchResult(NamedTuple):
    tokens: jax.Array      # (B, K, T_max) best-first finalized hypotheses
    scores: jax.Array      # (B, K) normalized scores (NEG_INF = empty slot)
    lengths: jax.Array     # (B, K) hypothesis lengths incl. prefix and EOS
    steps: jax.Array       # () number of decode steps executed


class _State(NamedTuple):
    step: jax.Array        # scalar: next position to generate
    tokens: jax.Array      # (B, K, T_max)
    scores: jax.Array      # (B, K) running sum of lprobs
    cache: object          # pytree, leading dim B*K
    fin_tokens: jax.Array  # (B, K, T_max)
    fin_scores: jax.Array  # (B, K) normalized, NEG_INF if empty
    fin_lengths: jax.Array # (B, K)
    pending_src: jax.Array # (B*K,) beam-origin permutation (src_to_step mode)


def beam_search(step_fn: Callable, cache, prefix: jax.Array, prefix_len: jax.Array,
                opts: BeamSearchOptions, vocab_size: int, *,
                processors: Sequence[Callable] = (),
                cache_reorder: Optional[Callable] = None,
                src_to_step: bool = False,
                candidate_mode: bool = False) -> BeamSearchResult:
    """Run beam search.

    ``prefix``: (B, P) forced target prefix (e.g. [eos, lang]); ``prefix_len``: (B,)
    actual prefix lengths (P static).
    ``cache``: initial decoder cache pytree with a B*K beam axis (already
    beam-expanded) on axis 0, or on axis 1 for layer-stacked (L, B*K, ...) caches.
    ``step_fn(tok_t, cache, step)``: tok_t (B*K, 1) int32 -> ((B*K, V) fp32 logits, cache).
    ``cache_reorder(cache, flat_src)``: optional explicit beam-reorder (gather the
    (B*K,) int32 ``flat_src`` on the beam axis of every per-beam array); pass it
    when the default axis detection (axis 0 if its size is B*K else axis 1) is
    ambiguous, e.g. a layer-stacked cache where L happens to equal B*K.

    ``candidate_mode``: the step_fn returns ``(cand_lprobs (B*K, C),
    cand_idx (B*K, C) i32, cache)`` — per-beam top-C log-probs instead of the
    full (B*K, V) logits (ops/kernels/vocab_topk.py). EXACT for C >= 2K+1 when
    there are no step processors and unk_penalty == 0: every global top-2K
    continuation is inside its beam's top-(2K+1) even after min-length EOS
    suppression removes one candidate. Requires ``src_to_step``.
    """
    B, P = prefix.shape
    K = opts.beam_size
    T = opts.max_len
    if candidate_mode:
        assert src_to_step and not processors, \
            "candidate_mode requires src_to_step and no step processors"
        assert opts.unk_penalty == 0.0, \
            "candidate_mode is exact only with unk_penalty == 0"

    tokens0 = jnp.full((B, K, T), opts.pad_idx, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(
        tokens0, jnp.broadcast_to(prefix[:, None, :], (B, K, P)), (0, 0, 0))
    # beams 1..K-1 start dead so the first expansion comes from beam 0 only
    scores0 = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.full((B, K - 1), NEG_INF)], axis=1).astype(jnp.float32)

    state = _State(
        step=jnp.asarray(0, jnp.int32),
        tokens=tokens0,
        scores=scores0,
        cache=cache,
        fin_tokens=jnp.full((B, K, T), opts.pad_idx, jnp.int32),
        fin_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        fin_lengths=jnp.zeros((B, K), jnp.int32),
        pending_src=jnp.arange(B * K, dtype=jnp.int32),
    )

    def normalize(score_sum, length):
        return score_sum / jnp.power(length.astype(jnp.float32) + 1.0, opts.len_penalty)

    def cond(s: _State):
        # upper bound of any continuation: negative sums only improve with length
        best_cont = normalize(jnp.max(s.scores, axis=1), jnp.full((B,), T, jnp.int32))
        worst_fin = jnp.min(s.fin_scores, axis=1)
        all_full = jnp.all(s.fin_scores > NEG_INF / 2, axis=1)
        done = all_full & (worst_fin >= best_cont)
        return (s.step < T - 1) & ~jnp.all(done)

    def body(s: _State):
        step = s.step
        tok_t = jax.lax.dynamic_slice_in_dim(s.tokens, step, 1, axis=2)  # (B,K,1)
        gen_pos = step + 1  # position being filled now
        in_prefix = gen_pos < prefix_len[:, None]                      # (B, 1)
        gen_count = gen_pos - prefix_len[:, None]                       # tokens generated
        eos_banned = gen_count < opts.min_len
        force_eos = gen_pos >= (T - 1)

        if candidate_mode:
            cand_lp, cand_ix, cache = step_fn(tok_t.reshape(B * K, 1),
                                              s.cache, step, s.pending_src)
            C = cand_lp.shape[-1]
            lp = cand_lp.astype(jnp.float32).reshape(B, K, C)
            ix = cand_ix.reshape(B, K, C)
            # min-length EOS suppression on the candidate set
            lp = jnp.where((ix == opts.eos_idx) & eos_banned[:, :, None],
                           NEG_INF, lp)

            # prefix / hard-max forcing replace the candidate set outright
            def _forced(args):
                lp, ix = args
                nxt = jax.lax.dynamic_slice_in_dim(
                    prefix, jnp.clip(gen_pos, 0, P - 1), 1, axis=1)     # (B,1)
                ftok = jnp.where(force_eos, opts.eos_idx, nxt)          # (B,1)
                first = jnp.arange(C)[None, None, :] == 0
                f_lp = jnp.where(first, 0.0, NEG_INF)
                f_ix = jnp.broadcast_to(ftok[:, :, None], (B, K, C))
                use = in_prefix[:, :, None] | force_eos
                return (jnp.where(use, f_lp, lp).astype(jnp.float32),
                        jnp.where(use, f_ix, ix))

            lp, ix = jax.lax.cond(jnp.any(in_prefix) | force_eos,
                                  _forced, lambda a: a, (lp, ix))
            cand = s.scores[:, :, None] + lp                            # (B,K,C)
            flat = cand.reshape(B, K * C)
            top_scores, sel = jax.lax.top_k(flat, 2 * K)                # (B,2K)
            src_beam = sel // C
            tok = jnp.take_along_axis(ix.reshape(B, K * C), sel, axis=1
                                      ).astype(jnp.int32)
        else:
            if src_to_step:
                # the PREVIOUS selection's beam reorder is fused into this
                # step's cache access (transformer_decoder_step beam_src) —
                # one cache pass instead of gather + row read-modify-write
                logits, cache = step_fn(tok_t.reshape(B * K, 1), s.cache, step,
                                        s.pending_src)
            else:
                logits, cache = step_fn(tok_t.reshape(B * K, 1), s.cache, step)
            lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lprobs = lprobs.reshape(B, K, vocab_size)

            # --- step processors (operate on the generated region only) ---
            for proc in processors:
                lprobs = proc(s.tokens, step, lprobs)

            # unk penalty & min-length EOS suppression (single-column edits)
            lprobs = lprobs.at[:, :, opts.unk_idx].add(-opts.unk_penalty)
            lprobs = lprobs.at[:, :, opts.eos_idx].set(
                jnp.where(eos_banned, NEG_INF, lprobs[:, :, opts.eos_idx]))

            # hard-max EOS forcing & prefix forcing build full-(B,K,V)
            # selects — only active in the first P and last steps, so gate
            # them behind a lax.cond (~0.4 ms/step of VPU selects otherwise)
            def _forced_lprobs(lp):
                if_force = jnp.full((B, K, vocab_size), NEG_INF
                                    ).at[:, :, opts.eos_idx].set(0.0)
                lp = jnp.where(force_eos, if_force, lp)
                nxt = jax.lax.dynamic_slice_in_dim(
                    prefix, jnp.clip(gen_pos, 0, P - 1), 1, axis=1)     # (B, 1)
                forced = jnp.where(
                    jnp.arange(vocab_size)[None, None, :] == nxt[:, :, None],
                    0.0, NEG_INF)
                forced = jnp.broadcast_to(forced, (B, K, vocab_size))
                return jnp.where(in_prefix[:, :, None], forced, lp)

            lprobs = jax.lax.cond(jnp.any(in_prefix) | force_eos,
                                  _forced_lprobs, lambda lp: lp, lprobs)

            # dead beams must not spawn candidates
            cand = s.scores[:, :, None] + lprobs                        # (B,K,V)
            flat = cand.reshape(B, K * vocab_size)
            if os.environ.get("SEAMLESS_APPROX_TOPK"):
                # TPU-optimized partial reduction (jax.lax.approx_max_k);
                # exact for k=2K with recall_target=1.0 per its TPU contract
                top_scores, top_idx = jax.lax.approx_max_k(
                    flat, 2 * K, recall_target=1.0, aggregate_to_topk=True)
            else:
                top_scores, top_idx = jax.lax.top_k(flat, 2 * K)        # (B,2K)
            src_beam = top_idx // vocab_size
            tok = (top_idx % vocab_size).astype(jnp.int32)
        is_eos = ((tok == opts.eos_idx)
                  & ~jnp.broadcast_to(in_prefix, (B, 2 * K))
                  & (top_scores > NEG_INF / 2))   # cpp: tok_score != -INF
        # Only EOS candidates ranked within the top K finalize — the fairseq
        # convention (fairseq sequence_generator.py eos_mask[:, :beam_size];
        # HF transformers _update_finished_beams top_num_beam_mask). The cpp
        # walk (fairseq2.cpp:1545-1560) finalizes any EOS encountered before
        # K ongoing beams are collected — a superset that differs only when
        # several EOS candidates tie at the top; cross-checked end-to-end
        # against hf generate in tests/integration/test_hf_conversion.py.
        fin_eos = is_eos & (jnp.arange(2 * K)[None, :] < K)

        # ----- finalize EOS candidates into the fin_* set -----
        # no-op on steps with no EOS candidate (most of them, min_len blocks
        # EOS early) — gate the takes/concats/top_k behind a lax.cond
        hyp_len = gen_pos + 1                                           # incl. EOS
        pos_is_gen = jnp.arange(T)[None, None, :] == gen_pos            # (1,1,T)

        def _finalize(_):
            norm_eos = jnp.where(
                fin_eos, normalize(top_scores, jnp.broadcast_to(
                    hyp_len.astype(jnp.float32), top_scores.shape)), NEG_INF)
            # candidate token rows: parent tokens + EOS spliced at gen_pos
            parent_tokens = jnp.take_along_axis(
                s.tokens, src_beam[:, :, None], axis=1)                 # (B,2K,T)
            eos_tokens = jnp.where(pos_is_gen, opts.eos_idx, parent_tokens)
            all_fin_scores = jnp.concatenate([s.fin_scores, norm_eos], axis=1)
            all_fin_tokens = jnp.concatenate([s.fin_tokens, eos_tokens], axis=1)
            all_fin_lengths = jnp.concatenate(
                [s.fin_lengths,
                 jnp.broadcast_to(hyp_len[None, None], (B, 2 * K))], axis=1)
            f_scores, f_sel = jax.lax.top_k(all_fin_scores, K)
            return (jnp.take_along_axis(all_fin_tokens, f_sel[:, :, None], axis=1),
                    f_scores,
                    jnp.take_along_axis(all_fin_lengths, f_sel, axis=1))

        fin_tokens, fin_scores, fin_lengths = jax.lax.cond(
            jnp.any(fin_eos), _finalize,
            lambda _: (s.fin_tokens, s.fin_scores, s.fin_lengths), None)

        # ----- pick K continuing beams (non-EOS) -----
        cont_scores_cand = jnp.where(is_eos, NEG_INF, top_scores)
        cont_pick_scores, cont_sel = jax.lax.top_k(cont_scores_cand, K)  # (B,K)
        new_beam_src = jnp.take_along_axis(src_beam, cont_sel, axis=1)
        new_tok = jnp.take_along_axis(tok, cont_sel, axis=1)
        new_tokens = jnp.take_along_axis(s.tokens, new_beam_src[:, :, None], axis=1)
        new_tokens = jnp.where(pos_is_gen, new_tok[:, :, None], new_tokens)

        # reorder cache by beam origin on the flattened B*K axis
        flat_src = (jnp.arange(B)[:, None] * K + new_beam_src).reshape(B * K)
        if src_to_step:
            pass                       # deferred into the next step_fn call
        elif cache_reorder is not None:
            cache = cache_reorder(cache, flat_src)
        else:
            def gather_beam(a):
                if not hasattr(a, "ndim") or a.ndim < 1:
                    return a
                if a.shape[0] == B * K:
                    return jnp.take(a, flat_src, axis=0)
                if a.ndim >= 2 and a.shape[1] == B * K:
                    # layer-stacked (L, B*K, ...) decoder caches
                    return jnp.take(a, flat_src, axis=1)
                return a
            cache = jax.tree.map(gather_beam, cache)

        return _State(step + 1, new_tokens, cont_pick_scores, cache,
                      fin_tokens, fin_scores, fin_lengths, flat_src)

    final = jax.lax.while_loop(cond, body, state)

    # if some rows never finalized K hypotheses, fall back to live beams
    live_norm = final.scores / jnp.power(
        (final.step + 1).astype(jnp.float32) + 1.0, opts.len_penalty)
    need_fill = final.fin_scores <= NEG_INF / 2
    fin_scores = jnp.where(need_fill, live_norm, final.fin_scores)
    fin_tokens = jnp.where(need_fill[:, :, None], final.tokens, final.fin_tokens)
    fin_lengths = jnp.where(need_fill, final.step + 1, final.fin_lengths)
    order = jnp.argsort(-fin_scores, axis=1)
    return BeamSearchResult(
        tokens=jnp.take_along_axis(fin_tokens, order[:, :, None], axis=1),
        scores=jnp.take_along_axis(fin_scores, order, axis=1),
        lengths=jnp.take_along_axis(fin_lengths, order, axis=1),
        steps=final.step,
    )


# ---------------------------------------------------------------------------
# Step processors (fairseq2 StepProcessor equivalents)
# ---------------------------------------------------------------------------

def make_ngram_repeat_block(ngram_size: int, vocab_size: int) -> Callable:
    """Ban tokens that would complete an already-seen n-gram
    (reference cli/m4t/predict/predict.py NGramRepeatBlockProcessor)."""

    def proc(tokens: jax.Array, step: jax.Array, lprobs: jax.Array) -> jax.Array:
        B, K, T = tokens.shape
        n = ngram_size
        if n <= 1:
            return lprobs
        # current context: last n-1 generated tokens ending at `step`
        ctx_idx = step - (n - 1) + 1 + jnp.arange(n - 1)                # (n-1,)
        ctx = tokens[:, :, jnp.clip(ctx_idx, 0, T - 1)]                 # (B,K,n-1)
        # all historical (n-1)-grams starting at position p, next token at p+n-1
        p = jnp.arange(T - n + 1)
        grams = tokens[:, :, p[:, None] + jnp.arange(n - 1)[None, :]]   # (B,K,P,n-1)
        nexts = tokens[:, :, p + (n - 1)]                               # (B,K,P)
        match = jnp.all(grams == ctx[:, :, None, :], axis=-1)           # (B,K,P)
        # only n-grams fully inside the generated region
        valid = (p + (n - 1))[None, None, :] <= step
        ban = match & valid & (step >= (n - 1))
        ban_onehot = jax.nn.one_hot(nexts, vocab_size, dtype=jnp.bool_) & ban[..., None]
        banned = jnp.any(ban_onehot, axis=2)                            # (B,K,V)
        return jnp.where(banned, NEG_INF, lprobs)

    return proc


def make_banned_sequence_processor(banned: jax.Array, banned_lens: jax.Array,
                                   vocab_size: int) -> Callable:
    """MinTox BannedSequenceProcessor (reference toxicity/mintox.py:125-135):
    if the last (m-1) generated tokens match a banned sequence's prefix, ban its
    final token. ``banned``: (N, M) left-padded with -1; ``banned_lens``: (N,)."""
    N, M = banned.shape

    def proc(tokens: jax.Array, step: jax.Array, lprobs: jax.Array) -> jax.Array:
        B, K, T = tokens.shape
        # window of the last M-1 tokens ending at `step` (inclusive)
        w_idx = step - (M - 1) + 1 + jnp.arange(M - 1)
        window = tokens[:, :, jnp.clip(w_idx, 0, T - 1)]                # (B,K,M-1)
        w_valid = w_idx >= 0

        def one_banned(seq, slen):
            # prefix = seq[:slen-1] right-aligned in the window
            plen = slen - 1
            # position j in window aligns with seq index M-1-? -> compare last plen
            seq_prefix = jnp.where(jnp.arange(M - 1) >= (M - 1 - plen),
                                   seq[jnp.clip(jnp.arange(M - 1) - (M - 1 - plen), 0, M - 1)],
                                   -2)
            cmp_mask = jnp.arange(M - 1) >= (M - 1 - plen)
            ok_steps = jnp.where(cmp_mask, (window == seq_prefix) & w_valid[None, None, :],
                                 True)
            matched = jnp.all(ok_steps, axis=-1)                        # (B,K)
            # a 1-token banned sequence is always "matched"
            matched = jnp.where(plen == 0, True, matched)
            last_tok = seq[jnp.clip(slen - 1, 0, M - 1)]
            return matched, last_tok

        matched, last_toks = jax.vmap(one_banned)(banned, banned_lens)  # (N,B,K),(N,)
        ban_mask = jax.nn.one_hot(last_toks, vocab_size, dtype=jnp.bool_)  # (N,V)
        banned_v = jnp.any(matched[..., None] & ban_mask[:, None, None, :], axis=0)
        return jnp.where(banned_v, NEG_INF, lprobs)

    return proc
