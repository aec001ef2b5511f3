"""SeamlessM4T v2 web demo (reference demo/m4tv2/app.py:1-370).

Gradio Blocks UI over the TPU-native Translator with the reference's five task
tabs (S2ST, S2TT, T2ST, T2TT, ASR). The task runners are plain functions built
by :func:`make_task_runners` so they are testable — and usable from any other
frontend — without gradio installed; only :func:`build_ui`/`main` import it.

Run:  python demo/app.py --model_name seamlessM4T_v2_large \
          [--local_hf_path DIR] [--quantize] [--share]
"""

from __future__ import annotations

import argparse
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from lang_list import LANGUAGE_NAME_TO_CODE, task_language_names  # noqa: E402

AUDIO_SAMPLE_RATE = 16000
MAX_INPUT_AUDIO_LENGTH = 60  # seconds (reference app.py:64)

DESCRIPTION = """\
# SeamlessM4T (TPU)
SeamlessM4T provides high-quality translation between speech and text in one
model: Speech-to-Speech (S2ST), Speech-to-Text (S2TT), Text-to-Speech (T2ST),
Text-to-Text (T2TT) and ASR. This demo runs the TPU-native JAX implementation.
"""


def _code(language_name: str) -> str:
    # accept raw codes too so API callers can skip display names
    return LANGUAGE_NAME_TO_CODE.get(language_name, language_name)


def load_audio(input_audio, warn: Callable[[str], None] = print
               ) -> Tuple[np.ndarray, int]:
    """Normalize the gradio audio payload (filepath str or (sr, array)) to a
    mono float32 waveform, truncated to MAX_INPUT_AUDIO_LENGTH (reference
    preprocess_audio, app.py:80-88)."""
    from seamless_communication_tpu.audio.wav import read_wav, resample

    if isinstance(input_audio, tuple):   # gradio type="numpy"
        sr, wav = input_audio
        wav = np.asarray(wav, np.float32)
        if wav.dtype.kind != "f" or np.abs(wav).max() > 4.0:
            wav = wav / 32768.0
    else:                                # type="filepath"
        wav, sr = read_wav(str(input_audio))
    if wav.ndim == 2:
        wav = wav.mean(axis=-1 if wav.shape[-1] <= 2 else 0)
    wav = resample(wav.astype(np.float32), int(sr), AUDIO_SAMPLE_RATE)
    max_samples = MAX_INPUT_AUDIO_LENGTH * AUDIO_SAMPLE_RATE
    if wav.shape[0] > max_samples:
        warn(f"Input audio is too long. Only the first "
             f"{MAX_INPUT_AUDIO_LENGTH} seconds is used.")
        wav = wav[:max_samples]
    return wav, AUDIO_SAMPLE_RATE


def make_task_runners(translator, warn: Callable[[str], None] = print
                      ) -> Dict[str, Callable]:
    """Build the five task closures the UI (or any caller) dispatches to.
    Signatures follow the reference run_* functions (app.py:91-157)."""

    def _speech_out(texts, speech):
        wav = np.asarray(speech.audio_wavs[0], np.float32)
        return (int(speech.sample_rate), wav), str(texts[0])

    def run_s2st(input_audio, source_language: str, target_language: str):
        wav, _ = load_audio(input_audio, warn)
        texts, speech = translator.predict(
            wav, "s2st", _code(target_language),
            src_lang=_code(source_language))
        return _speech_out(texts, speech)

    def run_s2tt(input_audio, source_language: str, target_language: str) -> str:
        wav, _ = load_audio(input_audio, warn)
        texts, _ = translator.predict(
            wav, "s2tt", _code(target_language),
            src_lang=_code(source_language))
        return str(texts[0])

    def run_t2st(input_text: str, source_language: str, target_language: str):
        texts, speech = translator.predict(
            input_text, "t2st", _code(target_language),
            src_lang=_code(source_language))
        return _speech_out(texts, speech)

    def run_t2tt(input_text: str, source_language: str, target_language: str) -> str:
        texts, _ = translator.predict(
            input_text, "t2tt", _code(target_language),
            src_lang=_code(source_language))
        return str(texts[0])

    def run_asr(input_audio, target_language: str) -> str:
        wav, _ = load_audio(input_audio, warn)
        code = _code(target_language)
        texts, _ = translator.predict(wav, "asr", code, src_lang=code)
        return str(texts[0])

    return {"s2st": run_s2st, "s2tt": run_s2tt, "t2st": run_t2st,
            "t2tt": run_t2tt, "asr": run_asr}


def build_translator(model_name: str = "seamlessM4T_v2_large",
                     vocoder_name: str = "vocoder_v2", *,
                     local_hf_path: Optional[str] = None,
                     quantize: bool = False):
    """Translator + its card (for language lists), mirroring cli/predict.py."""
    from seamless_communication_tpu.assets import load_card
    from seamless_communication_tpu.cli.loading import (
        load_unity_model_and_tokenizers, load_vocoder,
    )
    from seamless_communication_tpu.inference.translator import Translator

    params, cfg, text_tok, unit_tok, char_tok = load_unity_model_and_tokenizers(
        model_name, local_hf_path=local_hf_path, quantize=quantize)
    voc_params, voc_cfg, idx_map = load_vocoder(
        vocoder_name, local_hf_path=local_hf_path)
    translator = Translator(params, cfg, text_tok, unit_tok, char_tok,
                            vocoder_params=voc_params, vocoder_cfg=voc_cfg,
                            lang_spkr_idx_map=idx_map)
    return translator, load_card(model_name)


def build_ui(runners: Dict[str, Callable], langs: Dict[str, list],
             default_target: str = "French"):
    """Assemble the tabbed gradio Blocks app (reference app.py:159-370)."""
    import gradio as gr

    def audio_task_tab(task: str, fn, src_choices, tgt_choices, speech_out: bool):
        with gr.Blocks() as tab:
            with gr.Row():
                with gr.Column():
                    with gr.Group():
                        if task in ("s2st", "s2tt", "asr"):
                            inp = gr.Audio(label="Input speech", type="filepath")
                        else:
                            inp = gr.Textbox(label="Input text", lines=3)
                        inputs = [inp]
                        if task != "asr":
                            inputs.append(gr.Dropdown(
                                label="Source language", choices=src_choices,
                                value="English" if "English" in src_choices
                                else src_choices[0]))
                        tgt_default = (default_target if default_target
                                       in tgt_choices else tgt_choices[0])
                        inputs.append(gr.Dropdown(label="Target language",
                                                  choices=tgt_choices,
                                                  value=tgt_default))
                    btn = gr.Button("Translate" if task != "asr" else "Transcribe")
                with gr.Column():
                    with gr.Group():
                        outputs = []
                        if speech_out:
                            outputs.append(gr.Audio(label="Translated speech",
                                                    type="numpy"))
                        outputs.append(gr.Textbox(
                            label="Translated text" if task != "asr"
                            else "Transcribed text"))
            btn.click(fn=fn, inputs=inputs, outputs=outputs, api_name=task)
        return tab

    tabs = [
        ("S2ST", audio_task_tab("s2st", runners["s2st"], langs["text_source"],
                                langs["s2st_target"], True)),
        ("S2TT", audio_task_tab("s2tt", runners["s2tt"], langs["text_source"],
                                langs["s2tt_target"], False)),
        ("T2ST", audio_task_tab("t2st", runners["t2st"], langs["text_source"],
                                langs["t2st_target"], True)),
        ("T2TT", audio_task_tab("t2tt", runners["t2tt"], langs["text_source"],
                                langs["t2tt_target"], False)),
        ("ASR", audio_task_tab("asr", runners["asr"], langs["asr_target"],
                               langs["asr_target"], False)),
    ]
    with gr.Blocks(css="h1 { text-align: center }") as demo:
        gr.Markdown(DESCRIPTION)
        gr.TabbedInterface([t for _, t in tabs], [n for n, _ in tabs])
    return demo


def main() -> None:
    parser = argparse.ArgumentParser(description="SeamlessM4T gradio demo")
    parser.add_argument("--model_name", default="seamlessM4T_v2_large")
    parser.add_argument("--vocoder_name", default="vocoder_v2")
    parser.add_argument("--local_hf_path", default=None)
    parser.add_argument("--quantize", action="store_true")
    parser.add_argument("--server_port", type=int, default=7860)
    parser.add_argument("--share", action="store_true")
    args = parser.parse_args()

    import gradio as gr

    translator, card = build_translator(
        args.model_name, args.vocoder_name,
        local_hf_path=args.local_hf_path, quantize=args.quantize)
    runners = make_task_runners(translator, warn=gr.Warning)
    demo = build_ui(runners, task_language_names(card))
    demo.queue(max_size=50).launch(server_port=args.server_port,
                                   share=args.share)


if __name__ == "__main__":
    main()
