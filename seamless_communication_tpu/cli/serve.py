"""Serving CLI: HTTP endpoint with dynamic batching over one TPU chip.

    m4t_serve --model_name seamlessM4T_v2_large --port 8008 --quantize

POST /v1/translate {"task": "s2tt"|"t2tt"|"asr"|"s2st"|"t2st",
                    "tgt_lang": ..., "src_lang"?: ...,
                    "text"? | "audio_b64"? (16 kHz WAV, base64)}
GET  /healthz

With ``--streaming N`` the server also multiplexes up to N LIVE streaming S2T
sessions over the same chip through BatchedStreamingPool (streaming/multi.py):

POST /v1/stream/open  {"tgt_lang"}                       -> {"session_id"}
POST /v1/stream/push  {"session_id","audio_b64"|"samples","finished"?}
POST /v1/stream/poll  {"session_id"}
POST /v1/stream/close {"session_id"}

(The reference has no serving path — inference/serving.py is TPU-native new
surface; see docstring there for the batching model.)
"""

from __future__ import annotations

import argparse
import logging


def main() -> None:
    parser = argparse.ArgumentParser(description="Seamless TPU serving")
    parser.add_argument("--model_name", type=str, default="seamlessM4T_v2_large")
    parser.add_argument("--vocoder_name", type=str, default="vocoder_v2")
    parser.add_argument("--local_hf_path", type=str, default=None)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8008)
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--max_wait_ms", type=int, default=30)
    parser.add_argument("--quantize", action="store_true",
                        help="int8 weight-only quantization (serving default "
                             "recommendation; halves decode HBM traffic)")
    parser.add_argument("--no_speech_out", action="store_true",
                        help="skip loading the vocoder (text-output tasks only)")
    parser.add_argument("--kv_bits", type=int, default=8, choices=[8, 4],
                        help="self-attention KV cache precision for the "
                             "offline decode (4 = packed int4: half the "
                             "per-step KV HBM read again vs int8; lossier)")
    parser.add_argument("--warmup", type=str, default=None,
                        help="comma-separated task:tgt_lang[:src_lang] specs to "
                             "pre-compile before accepting traffic, e.g. "
                             "'s2tt:spa,t2tt:fra:eng' (first request otherwise "
                             "pays the jit compile)")
    parser.add_argument("--streaming", type=int, default=0, metavar="N",
                        help="enable N concurrent live streaming S2T sessions "
                             "(BatchedStreamingPool slots); requires a "
                             "chunk-causal streaming unity card "
                             "(--stream_unity_name)")
    parser.add_argument("--stream_unity_name", type=str,
                        default="seamless_streaming_unity")
    parser.add_argument("--stream_monotonic_name", type=str,
                        default="seamless_streaming_monotonic_decoder")
    parser.add_argument("--stream_tick_ms", type=int, default=40,
                        help="pool drain cadence after a session's source "
                             "ends")
    parser.add_argument("--stream_local_hf_path", type=str, default=None)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. 'cpu'); note that "
                             "JAX_PLATFORMS env vars are ignored when a "
                             "sitecustomize pre-imports jax")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from seamless_communication_tpu.cli.loading import (
        load_unity_model_and_tokenizers, load_vocoder,
    )
    from seamless_communication_tpu.inference.serving import serve
    from seamless_communication_tpu.inference.translator import Translator

    params, cfg, text_tok, unit_tok, char_tok = load_unity_model_and_tokenizers(
        args.model_name, local_hf_path=args.local_hf_path,
        quantize=args.quantize)
    voc_params = voc_cfg = None
    idx_map = {}
    if not args.no_speech_out:
        voc_params, voc_cfg, idx_map = load_vocoder(
            args.vocoder_name, local_hf_path=args.local_hf_path)
    text_opts = None
    if args.kv_bits != 8:
        from seamless_communication_tpu.inference.generator import (
            SequenceGeneratorOptions,
        )
        text_opts = SequenceGeneratorOptions(kv_cache_bits=args.kv_bits)
    translator = Translator(params, cfg, text_tok, unit_tok, char_tok,
                            vocoder_params=voc_params, vocoder_cfg=voc_cfg,
                            lang_spkr_idx_map=idx_map, text_opts=text_opts)
    import threading

    if args.warmup:
        # warm the task specs CONCURRENTLY: each predict compiles its own
        # stage programs (encode / beam / redecode / t2u / vocoder are
        # separate jits in UnitYGenerator), and the remote XLA service
        # compiles them in parallel — same cold-start win as the staged-AOT
        # bench (docs/performance.md "Cold start")
        from concurrent.futures import ThreadPoolExecutor

        import numpy as np

        def warm(spec):
            parts = spec.strip().split(":")
            task, tgt = parts[0], parts[1]
            src = parts[2] if len(parts) > 2 else None
            payload = ("warm up" if task.startswith("t")
                       else np.zeros(16000, np.float32))
            logging.getLogger("seamless_serve").info("warmup %s", spec)
            translator.predict([payload], task, tgt, src_lang=src)

        specs = args.warmup.split(",")
        with ThreadPoolExecutor(max_workers=min(4, len(specs))) as ex:
            for f in [ex.submit(warm, s) for s in specs]:
                f.result()

    stream_pool = None
    if args.streaming > 0:
        from seamless_communication_tpu.cli.loading import (
            load_monotonic_decoder,
        )
        from seamless_communication_tpu.streaming.multi import (
            BatchedStreamingPool,
        )
        s_params, s_cfg, s_text_tok, _, _ = load_unity_model_and_tokenizers(
            args.stream_unity_name,
            local_hf_path=args.stream_local_hf_path or args.local_hf_path,
            quantize=args.quantize)
        mono_params, mono_cfg = load_monotonic_decoder(
            args.stream_monotonic_name)
        # server audio arrives as [-1, 1] floats (decoded WAV), so the fbank
        # front end denormalizes to 16-bit scale (reference streaming inputs)
        stream_pool = BatchedStreamingPool(
            s_params, s_cfg, mono_params, mono_cfg, s_text_tok,
            n_slots=args.streaming, denormalize=True,
            mono_quantize_int8=args.quantize or None)

    server = serve(translator, host=args.host, port=args.port,
                   max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
                   stream_pool=stream_pool, stream_tick_ms=args.stream_tick_ms)
    try:
        threading.Event().wait()  # serve() runs in a background thread; block
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
