from seamless_communication_tpu.models.unity.unit_tokenizer import (  # noqa: F401
    UnitTokenizer,
)
