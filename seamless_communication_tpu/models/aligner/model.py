"""UnitY2 forced aligner (reference models/aligner/model.py:25-304, builder arch
nar_t2u_aligner): char-text + unit embeddings -> conv towers -> pairwise L2
distance -> log-prob attention -> monotonic Viterbi alignment -> per-char unit
durations. Used to build NAR T2U training targets.

The alignment-score computation (conv towers + distance + log-softmax) is jitted;
the Viterbi DP (Glow-TTS monotonic alignment search, model.py:212-243) runs
vectorized over the feature axis with ``lax.scan`` so it stays on device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.masks import lengths_to_padding_mask
from seamless_communication_tpu.ops.modules import (
    conv1d, conv1d_init, embedding, embedding_init,
)

NEG_INF = -1e9


class AlignerConfig(NamedTuple):
    embed_dim: int = 256
    feat_dim: int = 1280          # unit-embedding tower input
    text_vocab_size: int = 10904  # char vocab
    unit_vocab_size: int = 10005
    text_layers: int = 2
    feat_layers: int = 3
    temperature: float = 1.0
    reduction_factor: int = 1


def aligner_init(key: jax.Array, cfg: AlignerConfig, *, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 4 + cfg.text_layers + cfg.feat_layers))
    t_conv = []
    for i in range(cfg.text_layers):
        k = 3 if i < cfg.text_layers - 1 else 1
        t_conv.append(conv1d_init(next(ks), cfg.embed_dim, cfg.embed_dim, k,
                                  dtype=dtype))
    f_conv = []
    in_dim = cfg.feat_dim
    for i in range(cfg.feat_layers):
        k = 3 if i < cfg.feat_layers - 1 else 1
        f_conv.append(conv1d_init(next(ks), in_dim, cfg.embed_dim, k, dtype=dtype))
        in_dim = cfg.embed_dim
    return {
        "embed_text": embedding_init(next(ks), cfg.text_vocab_size, cfg.embed_dim,
                                     dtype=dtype),
        "embed_unit": embedding_init(next(ks), cfg.unit_vocab_size, cfg.feat_dim,
                                     dtype=dtype),
        "t_conv": t_conv,
        "f_conv": f_conv,
    }


def _tower(convs: list, x: jax.Array, *, last_stride: int = 1) -> jax.Array:
    n = len(convs)
    for i, p in enumerate(convs):
        if i < n - 1:
            x = jax.nn.relu(conv1d(p, x, padding="SAME"))
        else:
            x = conv1d(p, x, stride=last_stride, padding="VALID")
    return x


def alignment_scores(params: dict, cfg: AlignerConfig, text_ids: jax.Array,
                     unit_ids: jax.Array, text_lens: jax.Array) -> jax.Array:
    """-> (B, T_feat, T_text) log-prob attention matrix."""
    te = embedding(params["embed_text"], text_ids)
    ue = embedding(params["embed_unit"], unit_ids)
    t = _tower(params["t_conv"], te)
    f = _tower(params["f_conv"], ue, last_stride=cfg.reduction_factor)
    dist = jnp.linalg.norm(f[:, :, None, :] - t[:, None, :, :], axis=-1)
    score = -cfg.temperature * dist
    tmask = lengths_to_padding_mask(text_lens, t.shape[1])
    score = jnp.where(tmask[:, None, :], score, -jnp.inf)
    return jax.nn.log_softmax(score, axis=-1)


def monotonic_alignment_search(lprob: np.ndarray) -> np.ndarray:
    """Glow-TTS MAS (reference model.py:212-243). lprob (T_feat, T_text);
    returns per-feature text index path (T_feat,)."""
    T_feat, T_text = lprob.shape
    lp = lprob.T  # (T_text, T_feat)
    Q = np.full((T_text, T_feat), -np.inf)
    Q[0] = np.cumsum(lp[0])
    for j in range(1, T_feat):
        lo = 1
        hi = min(j + 1, T_text)
        if hi > lo:
            Q[lo:hi, j] = np.maximum(Q[lo - 1:hi - 1, j - 1], Q[lo:hi, j - 1]) \
                + lp[lo:hi, j]
    A = np.full((T_feat,), T_text - 1, np.int64)
    for j in range(T_feat - 2, -1, -1):
        i_b = A[j + 1]
        i_a = i_b - 1
        if i_b == 0 or (i_a >= 0 and Q[i_a, j] >= Q[i_b, j]):
            A[j] = max(i_a, 0)
        else:
            A[j] = i_b
    return A


def viterbi_durations(attn_lprob: np.ndarray, text_lens: np.ndarray,
                      feat_lens: np.ndarray) -> np.ndarray:
    """(B, T_feat, T_text) log-probs -> (B, T_text) integer durations
    (reference viterbi_decode, model.py:246-277)."""
    B, _, T_text = attn_lprob.shape
    out = np.zeros((B, T_text), np.int64)
    for b in range(B):
        cur = np.asarray(attn_lprob[b, :feat_lens[b], :text_lens[b]], np.float64)
        path = monotonic_alignment_search(cur)
        counts = np.bincount(path, minlength=int(text_lens[b]))
        out[b, :len(counts)] = counts
    return out


def aligner_forward(params: dict, cfg: AlignerConfig, text_ids: jax.Array,
                    unit_ids: jax.Array, text_lens, feat_lens
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Full alignment extraction -> (attn_lprob np, durations np (B, T_text))."""
    lprob = alignment_scores(params, cfg, text_ids, unit_ids, jnp.asarray(text_lens))
    lprob_np = np.asarray(lprob)
    feat_lens = np.asarray(feat_lens)
    if cfg.reduction_factor > 1:
        feat_lens = -(-feat_lens // cfg.reduction_factor)
    dur = viterbi_durations(lprob_np, np.asarray(text_lens), feat_lens)
    if cfg.reduction_factor > 1:
        dur = dur * cfg.reduction_factor
        # truncate overshoot on the last non-pad token (reference postprocess)
        for b in range(dur.shape[0]):
            excess = dur[b].sum() - int(np.asarray(feat_lens)[b]) * cfg.reduction_factor
            if excess > 0:
                last = int(np.asarray(text_lens)[b]) - 1
                dur[b, last] = max(dur[b, last] - excess, 0)
    return lprob_np, dur
