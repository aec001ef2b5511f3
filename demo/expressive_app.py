"""SeamlessExpressive web demo (reference demo/expressive/app.py:1-285).

Expressive S2ST: the input's gcmvn-normalized fbank conditions PRETSSEL so the
output preserves the speaker's prosody (rate, pauses, vocal style). As in
demo/app.py, the runner is a plain function (`make_expressive_runner`) so it's
testable without gradio; the UI wrapper imports gradio lazily.

Run:  python demo/expressive_app.py [--model_name seamless_expressivity] \
          [--vocoder_name vocoder_pretssel] [--share]
"""

from __future__ import annotations

import argparse
from typing import Callable, Optional, Tuple

import numpy as np

from lang_list import LANGUAGE_NAME_TO_CODE, task_language_names  # noqa: E402

AUDIO_SAMPLE_RATE = 16000
MAX_INPUT_AUDIO_LENGTH = 10  # seconds (reference expressive/app.py:157)

DESCRIPTION = """\
# Seamless Expressive (TPU)
SeamlessExpressive translates speech while preserving underexplored aspects of
prosody — speech rate and pauses — and the style of the speaker's voice.
"""


def remove_prosody_tokens_from_text(text: str) -> str:
    """Strip emphasis '*' and pause '=' markers (reference app.py:161-165)."""
    return " ".join(text.replace("*", "").replace("=", "").split())


def _code(language_name: str) -> str:
    return LANGUAGE_NAME_TO_CODE.get(language_name, language_name)


class ExpressiveDemo:
    """Bundles the expressivity translator + PRETSSEL generator + gcmvn stats
    (the reference builds these as module globals, app.py:91-133)."""

    def __init__(self, translator, generator, gcmvn_mean: np.ndarray,
                 gcmvn_std: np.ndarray, fbank_fn: Optional[Callable] = None):
        from seamless_communication_tpu.audio.fbank import fbank_numpy

        self.translator = translator
        self.generator = generator
        self.gcmvn_mean = np.asarray(gcmvn_mean, np.float32)
        self.gcmvn_std = np.asarray(gcmvn_std, np.float32)
        self.fbank_fn = fbank_fn or fbank_numpy

    @classmethod
    def load(cls, model_name: str = "seamless_expressivity",
             vocoder_name: str = "vocoder_pretssel", *,
             local_hf_path: Optional[str] = None) -> "ExpressiveDemo":
        from seamless_communication_tpu.assets import load_card
        from seamless_communication_tpu.cli.loading import (
            load_pretssel_vocoder, load_unity_model_and_tokenizers,
        )
        from seamless_communication_tpu.inference.pretssel_generator import (
            PretsselGenerator,
        )
        from seamless_communication_tpu.inference.translator import Translator

        params, cfg, text_tok, unit_tok, char_tok = (
            load_unity_model_and_tokenizers(model_name,
                                            local_hf_path=local_hf_path))
        translator = Translator(params, cfg, text_tok, unit_tok, char_tok)

        voc_params, voc_cfg, mc, sample_rate = load_pretssel_vocoder(
            vocoder_name)
        langs = mc.get("langs", [])
        generator = PretsselGenerator(
            voc_params, voc_cfg, sample_rate=sample_rate,
            lang_to_index={l: i for i, l in enumerate(langs)})
        gcmvn = mc.get("gcmvn_stats", {})
        demo = cls(translator, generator,
                   np.asarray(gcmvn.get("mean", np.zeros(80))),
                   np.asarray(gcmvn.get("std", np.ones(80))))
        demo.card = load_card(model_name)
        return demo

    def run(self, input_audio, source_language: str, target_language: str,
            *, duration_factor: float = 1.0,
            warn: Callable[[str], None] = print
            ) -> Tuple[Tuple[int, np.ndarray], str]:
        """Expressive S2ST (reference run(), app.py:179-238): dual fbank
        normalization — per-utterance CMVN for the translator, gcmvn for the
        PRETSSEL prosody input — then text+units -> expressive waveform."""
        from app import load_audio

        wav, _ = load_audio(input_audio, warn)
        max_samples = MAX_INPUT_AUDIO_LENGTH * AUDIO_SAMPLE_RATE
        if wav.shape[0] > max_samples:
            warn(f"Input audio is too long. Only the first "
                 f"{MAX_INPUT_AUDIO_LENGTH} seconds is used.")
            wav = wav[:max_samples]

        fbank = self.fbank_fn(wav)
        gcmvn = ((fbank - self.gcmvn_mean[None]) /
                 self.gcmvn_std[None]).astype(np.float32)

        texts, speech = self.translator.predict(
            wav, "s2st", _code(target_language),
            src_lang=_code(source_language),
            duration_factor=duration_factor,
            prosody_encoder_input=gcmvn)
        wavs = self.generator.predict(
            speech.units, _code(target_language), gcmvn[None],
            np.array([gcmvn.shape[0]]), duration_factor=duration_factor)
        text_out = remove_prosody_tokens_from_text(str(texts[0]))
        return (self.generator.sample_rate,
                np.asarray(wavs[0], np.float32)), text_out


def make_expressive_runner(demo: ExpressiveDemo,
                           warn: Callable[[str], None] = print) -> Callable:
    def run(input_audio, source_language: str, target_language: str):
        return demo.run(input_audio, source_language, target_language,
                        warn=warn)
    return run


def build_ui(runner: Callable, langs: dict):
    import gradio as gr

    choices_src = langs["text_source"]
    choices_tgt = langs["s2st_target"]
    with gr.Blocks(css="h1 { text-align: center }") as ui:
        gr.Markdown(DESCRIPTION)
        with gr.Row():
            with gr.Column():
                with gr.Group():
                    input_audio = gr.Audio(label="Input speech", type="filepath")
                    source_language = gr.Dropdown(
                        label="Source language", choices=choices_src,
                        value="English" if "English" in choices_src
                        else choices_src[0])
                    target_language = gr.Dropdown(
                        label="Target language", choices=choices_tgt,
                        value="French" if "French" in choices_tgt
                        else choices_tgt[0])
                btn = gr.Button("Translate")
            with gr.Column():
                with gr.Group():
                    output_audio = gr.Audio(label="Translated speech",
                                            type="numpy")
                    output_text = gr.Textbox(label="Translated text")
        btn.click(fn=runner,
                  inputs=[input_audio, source_language, target_language],
                  outputs=[output_audio, output_text], api_name="run")
    return ui


def main() -> None:
    parser = argparse.ArgumentParser(description="SeamlessExpressive demo")
    parser.add_argument("--model_name", default="seamless_expressivity")
    parser.add_argument("--vocoder_name", default="vocoder_pretssel")
    parser.add_argument("--local_hf_path", default=None)
    parser.add_argument("--server_port", type=int, default=7860)
    parser.add_argument("--share", action="store_true")
    args = parser.parse_args()

    import gradio as gr

    demo = ExpressiveDemo.load(args.model_name, args.vocoder_name,
                               local_hf_path=args.local_hf_path)
    runner = make_expressive_runner(demo, warn=gr.Warning)
    ui = build_ui(runner, task_language_names(demo.card))
    ui.queue(max_size=50).launch(server_port=args.server_port,
                                 share=args.share)


if __name__ == "__main__":
    main()
