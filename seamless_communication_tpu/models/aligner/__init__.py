from seamless_communication_tpu.models.aligner.model import (  # noqa: F401
    AlignerConfig, aligner_init, aligner_forward, viterbi_durations,
)
