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
