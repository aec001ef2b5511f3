"""Core functional ops: the TPU-native replacement for the fairseq2 module layer
(reference: SURVEY.md §2.9) and the ggml op layer (§2.10)."""

from seamless_communication_tpu.ops.modules import (  # noqa: F401
    linear_init,
    linear,
    layer_norm_init,
    layer_norm,
    embedding_init,
    embedding,
    conv1d_init,
    conv1d,
    glu,
)
from seamless_communication_tpu.ops.masks import (  # noqa: F401
    lengths_to_padding_mask,
    causal_mask,
    combine_masks,
    NEG_INF,
)
from seamless_communication_tpu.ops.positional import (  # noqa: F401
    sinusoidal_positions,
    apply_sinusoidal_pos,
)
