"""Direct beam-search semantics tests (fairseq2 generate_sequence spec,
fairseq2.cpp:1371-1609): greedy-consistency, EOS finalization with length penalty,
prefix forcing, banned-sequence and n-gram processors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.beam_search import (
    BeamSearchOptions, beam_search, make_banned_sequence_processor,
    make_ngram_repeat_block,
)

V = 16
EOS, PAD, UNK = 3, 0, 1


def make_step_fn(score_table):
    """Deterministic 'model': logits depend only on the previous token.
    score_table: (V, V) — row = prev token, col = next-token logits."""
    table = jnp.asarray(score_table, jnp.float32)

    def step_fn(tok_t, cache, step):
        logits = table[tok_t[:, 0]]
        return logits, cache

    return step_fn


def run(score_table, *, beam_size=2, max_len=10, min_len=1, processors=(),
        prefix=((EOS, 5),), len_penalty=1.0):
    opts = BeamSearchOptions(beam_size=beam_size, max_len=max_len, min_len=min_len,
                             pad_idx=PAD, unk_idx=UNK, eos_idx=EOS,
                             len_penalty=len_penalty)
    prefix = jnp.asarray(prefix, jnp.int32)
    fn = jax.jit(lambda: beam_search(
        make_step_fn(score_table), {}, prefix,
        jnp.full((prefix.shape[0],), prefix.shape[1], jnp.int32), opts, V,
        processors=list(processors)))
    return fn()


def chain_table(chain, end_with_eos_after=None):
    """Build a table where prev->next follows `chain` deterministically."""
    t = np.full((V, V), -10.0, np.float32)
    for a, b in chain:
        t[a, b] = 0.0
    return t


def test_deterministic_chain_and_eos():
    # 5 -> 6 -> 7 -> EOS
    table = chain_table([(5, 6), (6, 7), (7, EOS), (EOS, EOS)])
    res = run(table)
    toks = np.asarray(res.tokens[0, 0])
    L = int(res.lengths[0, 0])
    assert list(toks[:L]) == [EOS, 5, 6, 7, EOS]


def test_min_len_suppresses_eos():
    # model wants EOS immediately; min_len forces 3 generated tokens first
    table = np.full((V, V), -10.0, np.float32)
    table[:, EOS] = 0.0
    table[:, 8] = -1.0
    res = run(table, min_len=3)
    toks = np.asarray(res.tokens[0, 0])
    L = int(res.lengths[0, 0])
    gen = list(toks[2:L])
    assert gen[-1] == EOS and len(gen) - 1 >= 3
    assert all(t == 8 for t in gen[:-1])


def test_banned_sequence_processor_blocks_bigram():
    # chain 5 -> 6 -> 7; ban sequence (6, 7) so after 6 the next-best (9) wins
    table = chain_table([(5, 6), (6, 7), (7, EOS), (9, EOS), (EOS, EOS)])
    table[6, 9] = -0.5   # second-best after banned 7
    banned = np.full((1, 2), -1, np.int32)
    banned[0] = [6, 7]
    proc = make_banned_sequence_processor(jnp.asarray(banned),
                                          jnp.asarray([2], jnp.int32), V)
    res = run(table, processors=[proc], max_len=12)
    toks = list(np.asarray(res.tokens[0, 0][:int(res.lengths[0, 0])]))
    assert 7 not in toks, toks
    assert 9 in toks


def test_banned_single_token():
    table = chain_table([(5, 6), (6, EOS), (EOS, EOS)])
    table[5, 8] = -0.2
    banned = np.asarray([[6]], np.int32)
    proc = make_banned_sequence_processor(jnp.asarray(banned),
                                          jnp.asarray([1], jnp.int32), V)
    res = run(table, processors=[proc], max_len=12)
    toks = list(np.asarray(res.tokens[0, 0][:int(res.lengths[0, 0])]))
    assert 6 not in toks


def test_ngram_repeat_block():
    # model loves cycling 6 -> 7 -> 6 -> 7...; 2-gram block must break the cycle
    table = np.full((V, V), -10.0, np.float32)
    table[5, 6] = 0.0
    table[6, 7] = 0.0
    table[7, 6] = 0.0
    table[7, EOS] = -0.5
    table[6, EOS] = -0.5
    table[EOS, EOS] = 0.0
    proc = make_ngram_repeat_block(2, V)
    res = run(table, processors=[proc], max_len=12)
    toks = list(np.asarray(res.tokens[0, 0][:int(res.lengths[0, 0])]))
    # the bigram (6,7) may appear once but not twice
    pairs = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
    assert pairs.count((6, 7)) <= 1, toks


def test_len_penalty_prefers_longer_with_equal_logprob():
    # two eos-able paths with same total score; higher len_penalty favors longer
    table = chain_table([(5, 6), (6, 7), (7, EOS), (EOS, EOS)])
    table[5, EOS] = -1e-6   # near-free early EOS
    res_short = run(table, len_penalty=0.1, min_len=0)
    res_long = run(table, len_penalty=2.0, min_len=0)
    assert int(res_long.lengths[0, 0]) >= int(res_short.lengths[0, 0])


def test_batch_rows_independent():
    table = chain_table([(5, 6), (6, EOS), (9, 10), (10, EOS), (EOS, EOS)])
    res = run(table, prefix=((EOS, 5), (EOS, 9)))
    t0 = list(np.asarray(res.tokens[0, 0][:int(res.lengths[0, 0])]))
    t1 = list(np.asarray(res.tokens[1, 0][:int(res.lengths[1, 0])]))
    assert t0 == [EOS, 5, 6, EOS]
    assert t1 == [EOS, 9, 10, EOS]


def test_beam_reorders_real_decoder_cache():
    """Regression: beam search must gather the (L, B*K, H, T, Dh) decoder KV
    cache on its BEAM axis (axis 1) when hypotheses switch beams. A former
    heuristic only matched caches whose axis 0 was B*K, silently skipping the
    layer-stacked real cache (wrong histories, plausible-looking output)."""
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.ops.beam_search import (
        BeamSearchOptions, beam_search,
    )
    from seamless_communication_tpu.ops.transformer import (
        decoder_cache_beam_reorder, decoder_cache_init, transformer_stack_init,
    )
    from seamless_communication_tpu.models.nllb.model import NllbConfig
    from seamless_communication_tpu.models.nllb import model as nllb

    K, V, T = 3, 50, 12
    # num_decoder_layers != K so the default axis heuristic is unambiguous
    cfg = NllbConfig(dim=32, num_encoder_layers=2, num_decoder_layers=2,
                     num_heads=4, ffn_inner_dim=64, vocab_size=V, max_seq_len=64)
    params = {"stack": transformer_stack_init(jax.random.PRNGKey(7),
                                              cfg.dec_cfg(), dtype=jnp.float32),
              "embed": {"embedding": 2.0 * jax.random.normal(
                  jax.random.PRNGKey(8), (V, 32), jnp.float32)}}
    enc = jnp.repeat(jax.random.normal(jax.random.PRNGKey(9), (1, 6, 32)),
                     K, axis=0)
    opts = BeamSearchOptions(beam_size=K, max_len=T, min_len=2, pad_idx=0,
                             unk_idx=1, eos_idx=3)
    prefix = jnp.array([[3, 5]], jnp.int32)

    def proc(tokens, step, lprobs):
        # force per-slot distinct boosted tokens at step 3: the topk assigns
        # them across slots, crossing beams AFTER histories have diverged
        div = (jnp.zeros_like(lprobs).at[:, 0, 10].set(50.0)
               .at[:, 1, 11].set(50.0).at[:, 2, 12].set(50.0))
        return jnp.where(step == 3, lprobs + div, lprobs)

    def step_fn(tok_t, cache, step):
        return nllb.text_decoder_step(params, tok_t, cache, step, cfg)

    def run(cache_reorder):
        return beam_search(step_fn,
                           decoder_cache_init(params["stack"], cfg.dec_cfg(),
                                              enc, T),
                           prefix, jnp.array([2], jnp.int32), opts, V,
                           processors=(proc,), cache_reorder=cache_reorder)

    correct = run(decoder_cache_beam_reorder)
    heuristic = run(None)           # default axis detection must agree exactly
    broken = run(lambda c, idx: c)  # the old no-op behavior

    np.testing.assert_array_equal(np.asarray(correct.tokens),
                                  np.asarray(heuristic.tokens))
    np.testing.assert_allclose(np.asarray(correct.scores),
                               np.asarray(heuristic.scores), rtol=0, atol=0)
    # the canary must have power: no-op reorder must change the result
    same_tokens = np.array_equal(np.asarray(correct.tokens),
                                 np.asarray(broken.tokens))
    same_scores = np.allclose(np.asarray(correct.scores),
                              np.asarray(broken.scores), atol=1e-6)
    assert not (same_tokens and same_scores), \
        "no-op cache reorder produced identical output; test has no power"


def test_src_to_step_stacked_cache_matches_classic():
    """The stacked-cache src_to_step variant (_decoder_step_scan_src — the
    fast-compile fallback documented in docs/performance.md) must produce the
    same tokens/scores as the classic reorder and the per-layer path."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.models.nllb.model import text_decoder_cache
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.ops.beam_search import (
        BeamSearchOptions, beam_search,
    )
    from seamless_communication_tpu.ops.transformer import (
        decoder_cache_beam_reorder,
    )

    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    K, V = 3, cfg.nllb.vocab_size
    rng = np.random.default_rng(0)
    enc = unity.EncoderOutput(
        jnp.asarray(rng.standard_normal((2 * K, 9, cfg.nllb.dim)), jnp.float32),
        jnp.full((2 * K,), 9, jnp.int32))
    step_fn, cache_fn = unity.make_text_decode_step(params, cfg, enc)
    prefix = jnp.array([[2, 5], [2, 6]], jnp.int32)
    opts = BeamSearchOptions(beam_size=K, max_len=14, min_len=3,
                             pad_idx=0, unk_idx=1, eos_idx=3)
    for int8 in (False, True):
        classic = beam_search(step_fn, cache_fn(14, int8), prefix,
                              jnp.array([2, 2], jnp.int32), opts, V,
                              cache_reorder=decoder_cache_beam_reorder)
        stacked = text_decoder_cache(params["text_decoder"], cfg.nllb,
                                     enc.seqs, 14, kv_int8=int8,
                                     per_layer=False)
        scan_src = beam_search(step_fn, stacked, prefix,
                               jnp.array([2, 2], jnp.int32), opts, V,
                               src_to_step=True)
        assert np.array_equal(np.asarray(classic.tokens),
                              np.asarray(scan_src.tokens))
        np.testing.assert_allclose(np.asarray(classic.scores),
                                   np.asarray(scan_src.scores), rtol=1e-5)


def test_lazy_indexed_cache_matches_classic_reorder():
    """Per-layer int8 cache in src_to_step mode now uses LAZY beam reorder (a
    row-origin table instead of physically permuting the KV buffers,
    ops/kernels/decode_attention.py indexed path). Tokens and scores must be
    identical to the classic physical-gather reorder."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.ops.beam_search import (
        BeamSearchOptions, beam_search,
    )
    from seamless_communication_tpu.ops.transformer import (
        decoder_cache_beam_reorder,
    )

    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    K, V = 3, cfg.nllb.vocab_size
    rng = np.random.default_rng(0)
    enc = unity.EncoderOutput(
        jnp.asarray(rng.standard_normal((2 * K, 9, cfg.nllb.dim)), jnp.float32),
        jnp.full((2 * K,), 9, jnp.int32))
    step_fn, cache_fn = unity.make_text_decode_step(params, cfg, enc)
    prefix = jnp.array([[2, 5], [2, 6]], jnp.int32)
    opts = BeamSearchOptions(beam_size=K, max_len=14, min_len=3,
                             pad_idx=0, unk_idx=1, eos_idx=3)

    import os

    os.environ["SEAMLESS_LAZY_REORDER"] = "1"
    try:
        cache = cache_fn(14, True)
        assert cache.row_src is not None
        lazy = beam_search(step_fn, cache, prefix, jnp.array([2, 2], jnp.int32),
                           opts, V, src_to_step=True)
    finally:
        del os.environ["SEAMLESS_LAZY_REORDER"]
    classic = beam_search(step_fn, cache_fn(14, True), prefix,
                          jnp.array([2, 2], jnp.int32), opts, V,
                          cache_reorder=decoder_cache_beam_reorder)
    assert np.array_equal(np.asarray(classic.tokens), np.asarray(lazy.tokens))
    np.testing.assert_allclose(np.asarray(classic.scores),
                               np.asarray(lazy.scores), rtol=1e-5, atol=1e-6)


def test_candidate_mode_matches_full_vocab():
    """candidate_mode (per-beam top-(2K+1) from the fused vocab kernel path)
    must produce identical tokens and scores to the full-vocab beam step —
    including through min-length EOS suppression, prefix forcing, and the
    hard-max EOS force (ops/kernels/vocab_topk.py exactness contract)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.ops.beam_search import (
        BeamSearchOptions, beam_search,
    )

    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    K, V = 3, cfg.nllb.vocab_size
    rng = np.random.default_rng(0)
    enc = unity.EncoderOutput(
        jnp.asarray(rng.standard_normal((2 * K, 9, cfg.nllb.dim)), jnp.float32),
        jnp.full((2 * K,), 9, jnp.int32))
    prefix = jnp.array([[2, 5], [2, 6]], jnp.int32)
    opts = BeamSearchOptions(beam_size=K, max_len=14, min_len=3,
                             pad_idx=0, unk_idx=1, eos_idx=3)

    step_full, cache_fn = unity.make_text_decode_step(params, cfg, enc)
    full = beam_search(step_full, cache_fn(14, True), prefix,
                       jnp.array([2, 2], jnp.int32), opts, V, src_to_step=True)

    step_cand, cache_fn2 = unity.make_text_decode_step(params, cfg, enc,
                                                       candidates=2 * K + 1)
    cand = beam_search(step_cand, cache_fn2(14, True), prefix,
                       jnp.array([2, 2], jnp.int32), opts, V,
                       src_to_step=True, candidate_mode=True)
    assert np.array_equal(np.asarray(full.tokens), np.asarray(cand.tokens))
    np.testing.assert_allclose(np.asarray(full.scores),
                               np.asarray(cand.scores), rtol=1e-5, atol=1e-6)
