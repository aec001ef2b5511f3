from seamless_communication_tpu.text.spm import SentencePieceModel  # noqa: F401
from seamless_communication_tpu.text.nllb import NllbTokenizer  # noqa: F401
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer  # noqa: F401
