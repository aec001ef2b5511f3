from seamless_communication_tpu.toxicity.etox import ETOXBadWordChecker  # noqa: F401
from seamless_communication_tpu.toxicity.mintox import mintox_pipeline  # noqa: F401
