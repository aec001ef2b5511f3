"""Label-smoothed NLL loss (fairseq2 SequenceModelOutput.compute_loss semantics,
used by the reference finetune trainer cli/m4t/finetune/trainer.py:155-202
with label_smoothing=0.2)."""

from __future__ import annotations


import jax
import jax.numpy as jnp


def label_smoothed_nll_loss(logits: jax.Array, targets: jax.Array, *,
                            pad_idx: int, label_smoothing: float = 0.2,
                            ignore_prefix_size: int = 0,
                            reduce_sum: bool = True):
    """logits (B, T, V) fp32; targets (B, T) ids; pads ignored.

    ``ignore_prefix_size``: skip the first N target positions (the reference's
    prefix_skip_len=1 excludes the lang token, trainer.py:178-181).

    Returns (loss, num_target_tokens) — loss summed over tokens (fairseq convention)
    so the caller can normalize by tokens across the data-parallel axis.
    """
    V = logits.shape[-1]
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(lprobs, axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    mask = (targets != pad_idx).astype(jnp.float32)
    if ignore_prefix_size:
        mask = mask.at[:, :ignore_prefix_size].set(0.0)
    loss = loss * mask
    n = jnp.sum(mask)
    if reduce_sum:
        return jnp.sum(loss), n
    return loss, n


def chunked_tied_nll_loss(features: jax.Array, embed_params: dict,
                          targets: jax.Array, *, pad_idx: int,
                          label_smoothing: float = 0.2,
                          ignore_prefix_size: int = 0,
                          chunk: int = 32):
    """Tied-projection CE WITHOUT materializing the full (B, T, V) logits.

    At a 256k vocab the fp32 logits + log-softmax of a (32, 128) batch are
    ~8 GB of live activations — the single largest tensor in the train step.
    This scans over T in chunks of ``chunk``, projecting features through the
    tied embedding and reducing to scalar loss per chunk inside a
    ``jax.checkpoint`` region: the live logits are (B, chunk, V) in BOTH the
    forward and the recomputing backward. Numerically identical to
    ``label_smoothed_nll_loss(project(features))`` (equality-tested, incl.
    gradients); the projection matmul runs twice, which is cheap relative to
    the HBM it frees (it enables the larger batches that set the measured
    single-chip tok/s, docs/performance.md).
    """
    from seamless_communication_tpu.ops.transformer import tied_projection

    B, T, D = features.shape
    pad_t = (-T) % chunk
    mask = (targets != pad_idx).astype(jnp.float32)
    if ignore_prefix_size:
        mask = mask.at[:, :ignore_prefix_size].set(0.0)
    f = jnp.pad(features, ((0, 0), (0, pad_t), (0, 0)))
    tg = jnp.pad(targets, ((0, 0), (0, pad_t)), constant_values=pad_idx)
    m = jnp.pad(mask, ((0, 0), (0, pad_t)))
    nc = f.shape[1] // chunk
    fs = f.reshape(B, nc, chunk, D).transpose(1, 0, 2, 3)
    tgs = tg.reshape(B, nc, chunk).transpose(1, 0, 2)
    ms = m.reshape(B, nc, chunk).transpose(1, 0, 2)

    def body(acc, xs):
        fc, tc, mc = xs
        lprobs = jax.nn.log_softmax(
            tied_projection(embed_params, fc).astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lprobs, tc[..., None], axis=-1)[..., 0]
        smooth = -jnp.mean(lprobs, axis=-1)
        l = (1.0 - label_smoothing) * nll + label_smoothing * smooth
        return acc + jnp.sum(l * mc), None

    total, _ = jax.lax.scan(jax.checkpoint(body), jnp.float32(0.0),
                            (fs, tgs, ms))
    return total, jnp.sum(mask)
