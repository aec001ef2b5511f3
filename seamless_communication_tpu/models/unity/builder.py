"""UnitY model configs + architecture registry.

Mirrors the reference arch registry (models/unity/builder.py:109-356):
  - ``base``          v1 large: w2vbert-600m (XL rel-pos, batch-norm conv) + NLLB
                      dense_1b (vocab 256102, NLLB-100) + AR T2U (vocab 10082)
  - ``medium``        v1 medium: w2vbert-300m + dense_600m (vocab 256206, NLLB-200)
  - ``base_v2``       v2 large: conformer_shaw 600m (Shaw rel-pos, causal conv) +
                      dense_1b + NAR T2U (char vocab 10943), max_seq 4096
  - ``expressivity_v2`` v2 + ECAPA prosody encoder, GELU NLLB, FiLM T2U,
                      unit vocab 10005, char vocab 10904, max 10000
  - ``streaming``     base_v2 speech encoder with chunked attention
                      (cards/seamless_streaming_unity.yaml)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional


from seamless_communication_tpu.models.nllb.model import NllbConfig
from seamless_communication_tpu.models.pretssel.ecapa_tdnn import EcapaConfig
from seamless_communication_tpu.models.unity.t2u import ArT2UConfig, NarT2UConfig
from seamless_communication_tpu.models.wav2vec2.encoder import SpeechEncoderConfig
from seamless_communication_tpu.ops.conformer import ConformerConfig


@dataclass(frozen=True)
class UnitYConfig:
    model_dim: int = 1024
    speech: SpeechEncoderConfig = field(default_factory=SpeechEncoderConfig)
    nllb: NllbConfig = field(default_factory=NllbConfig)
    use_text_encoder: bool = True
    # exactly one of these set
    nar_t2u: Optional[NarT2UConfig] = None
    ar_t2u: Optional[ArT2UConfig] = None
    prosody_encoder_dim: int = 0      # ECAPA output dim (512) when expressive
    # expressive models carry their own ECAPA prosody encoder (reference
    # builder.py:472-478 global_prosody; inference/generator.py:306-314)
    ecapa: Optional[EcapaConfig] = None
    arch: str = "base_v2"


_ARCHS: Dict[str, Callable[[], UnitYConfig]] = {}


def register_arch(name: str):
    def deco(fn):
        _ARCHS[name] = fn
        return fn
    return deco


def get_arch(name: str) -> UnitYConfig:
    if name not in _ARCHS:
        raise ValueError(f"unknown UnitY arch {name!r}; known: {sorted(_ARCHS)}")
    return _ARCHS[name]()


def _shaw_conformer(dim=1024, layers=24, heads=16, ffn=4096) -> ConformerConfig:
    return ConformerConfig(dim=dim, ffn_inner_dim=ffn, num_heads=heads,
                           num_layers=layers, pos_type="shaw",
                           causal_depthwise_conv=True, conv_norm="layer_norm",
                           shaw_max_left=64, shaw_max_right=8)


def _xl_conformer(dim=1024, layers=24, heads=16, ffn=4096) -> ConformerConfig:
    return ConformerConfig(dim=dim, ffn_inner_dim=ffn, num_heads=heads,
                           num_layers=layers, pos_type="xl",
                           causal_depthwise_conv=False, conv_norm="batch_norm")


@register_arch("base_v2")
def _base_v2() -> UnitYConfig:
    return UnitYConfig(
        speech=SpeechEncoderConfig(conformer=_shaw_conformer()),
        nllb=NllbConfig(vocab_size=256102, max_seq_len=4096),
        nar_t2u=NarT2UConfig(unit_vocab_size=10082, char_vocab_size=10943),
        arch="base_v2",
    )


@register_arch("base")
def _base_v1() -> UnitYConfig:
    return UnitYConfig(
        speech=SpeechEncoderConfig(conformer=_xl_conformer()),
        nllb=NllbConfig(vocab_size=256102, max_seq_len=1024),
        ar_t2u=ArT2UConfig(unit_vocab_size=10082),
        arch="base",
    )


@register_arch("medium")
def _medium() -> UnitYConfig:
    return UnitYConfig(
        model_dim=1024,
        speech=SpeechEncoderConfig(
            conformer=_xl_conformer(dim=1024, layers=12), model_dim=1024),
        nllb=NllbConfig(num_encoder_layers=12, num_decoder_layers=12,
                        ffn_inner_dim=4096, vocab_size=256206, max_seq_len=1024),
        ar_t2u=ArT2UConfig(num_encoder_layers=4, num_decoder_layers=4,
                           ffn_inner_dim=4096, unit_vocab_size=10082),
        arch="medium",
    )


@register_arch("expressivity_v2")
def _expressivity_v2() -> UnitYConfig:
    return UnitYConfig(
        speech=SpeechEncoderConfig(conformer=_shaw_conformer()),
        nllb=NllbConfig(vocab_size=256102, max_seq_len=10000, activation="gelu"),
        nar_t2u=NarT2UConfig(num_encoder_layers=4, num_decoder_layers=4,
                             unit_vocab_size=10005, char_vocab_size=10904,
                             max_seq_len=10000, film_cond_dim=512,
                             prosody_proj_dim=512),
        prosody_encoder_dim=512,
        ecapa=EcapaConfig(),
        arch="expressivity_v2",
    )


@register_arch("streaming")
def _streaming() -> UnitYConfig:
    base = _base_v2()
    return UnitYConfig(
        speech=SpeechEncoderConfig(conformer=_shaw_conformer(),
                                   chunk_size=8, left_chunk_num=-1),
        nllb=base.nllb,
        use_text_encoder=False,
        nar_t2u=base.nar_t2u,
        arch="streaming",
    )


def _nano_family(model_dim: int) -> UnitYConfig:
    """On-device archs (reference builder.py:227-356): 6-layer XL conformer over
    stride-4 stacked fbank, 1-enc/N-dec NLLB (vocab 20010), tiny AR T2U."""
    return UnitYConfig(
        model_dim=model_dim,
        speech=SpeechEncoderConfig(
            model_dim=model_dim, feature_dim=320, fbank_stride=4,
            ffn_inner_dim=model_dim * 4, num_adaptor_heads=16,
            conformer=_xl_conformer(dim=model_dim, layers=6, heads=16,
                                    ffn=model_dim * 4)),
        nllb=NllbConfig(dim=model_dim, num_encoder_layers=1, num_decoder_layers=3,
                        num_heads=16, ffn_inner_dim=model_dim * 8,
                        vocab_size=20010, max_seq_len=1024),
        ar_t2u=ArT2UConfig(model_dim=model_dim, num_encoder_layers=1,
                           num_decoder_layers=1, num_heads=16,
                           ffn_inner_dim=model_dim * 8, unit_vocab_size=10082),
        arch="seamless_nano",
    )


@register_arch("seamless_micro")
def _seamless_micro() -> UnitYConfig:
    return _nano_family(512)


@register_arch("seamless_nano")
def _seamless_nano() -> UnitYConfig:
    return _nano_family(256)


# tiny arch for hermetic tests / compile checks
@register_arch("tiny_v2")
def _tiny_v2() -> UnitYConfig:
    return UnitYConfig(
        model_dim=64,
        speech=SpeechEncoderConfig(
            model_dim=64, feature_dim=160, ffn_inner_dim=128, num_adaptor_heads=4,
            conformer=ConformerConfig(dim=64, ffn_inner_dim=128, num_heads=4,
                                      num_layers=2, depthwise_kernel_size=7,
                                      pos_type="shaw", shaw_max_left=8,
                                      shaw_max_right=3)),
        nllb=NllbConfig(dim=64, num_encoder_layers=2, num_decoder_layers=2,
                        num_heads=4, ffn_inner_dim=128, vocab_size=256,
                        max_seq_len=512),
        nar_t2u=NarT2UConfig(model_dim=64, num_encoder_layers=2, num_decoder_layers=2,
                             num_heads=4, ffn_inner_dim=128, unit_vocab_size=112,
                             char_vocab_size=64, dur_predictor_hidden=32,
                             max_seq_len=512),
        arch="tiny_v2",
    )


@register_arch("tiny_expressive")
def _tiny_expressive() -> UnitYConfig:
    base = _tiny_v2()
    return UnitYConfig(
        model_dim=64,
        speech=base.speech,
        nllb=NllbConfig(dim=64, num_encoder_layers=2, num_decoder_layers=2,
                        num_heads=4, ffn_inner_dim=128, vocab_size=256,
                        max_seq_len=512, activation="gelu"),
        nar_t2u=NarT2UConfig(model_dim=64, num_encoder_layers=2,
                             num_decoder_layers=2, num_heads=4, ffn_inner_dim=128,
                             unit_vocab_size=112, char_vocab_size=64,
                             dur_predictor_hidden=32, max_seq_len=512,
                             film_cond_dim=32, prosody_proj_dim=32),
        prosody_encoder_dim=32,
        ecapa=EcapaConfig(channels=(32, 32, 32, 32, 96), attention_channels=16,
                          res2net_scale=4, se_channels=16, embed_dim=32),
        arch="tiny_expressive",
    )


@register_arch("tiny_v1")
def _tiny_v1() -> UnitYConfig:
    return UnitYConfig(
        model_dim=64,
        speech=SpeechEncoderConfig(
            model_dim=64, feature_dim=160, ffn_inner_dim=128, num_adaptor_heads=4,
            conformer=ConformerConfig(dim=64, ffn_inner_dim=128, num_heads=4,
                                      num_layers=2, depthwise_kernel_size=7,
                                      pos_type="xl", causal_depthwise_conv=False,
                                      conv_norm="batch_norm")),
        nllb=NllbConfig(dim=64, num_encoder_layers=2, num_decoder_layers=2,
                        num_heads=4, ffn_inner_dim=128, vocab_size=256,
                        max_seq_len=512),
        ar_t2u=ArT2UConfig(model_dim=64, num_encoder_layers=2, num_decoder_layers=2,
                           num_heads=4, ffn_inner_dim=128, unit_vocab_size=112,
                           max_seq_len=256),
        arch="tiny_v1",
    )
