from seamless_communication_tpu.models.pretssel.ecapa_tdnn import (  # noqa: F401
    EcapaConfig, ecapa_init, ecapa_forward,
)
