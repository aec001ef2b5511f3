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
