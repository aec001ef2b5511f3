"""m4t_audio_to_units CLI (reference cli/m4t/audio_to_units/audio_to_units.py:17-53)."""

from __future__ import annotations

import argparse
import logging

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("audio_to_units")


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Convert raw audio to speech units (XLSR + kmeans)")
    parser.add_argument("audio", type=str, help="WAV path")
    parser.add_argument("--kmeans_path", type=str, required=True,
                        help="kmeans centroids .npy (10k x 1280)")
    parser.add_argument("--w2v2_checkpoint", type=str, required=True,
                        help="XLSR2-1B weights: original torch .pt "
                             "(xlsr2_1b_v2.pt) or converted params (orbax/npz)")
    parser.add_argument("--out_layer_number", type=int, default=35)
    args = parser.parse_args()


    from seamless_communication_tpu.audio.wav import read_wav, resample
    from seamless_communication_tpu.models.unit_extractor import (
        KmeansModel, UnitExtractor,
    )
    from seamless_communication_tpu.checkpoint.serialize import load_params

    wav, sr = read_wav(args.audio)
    wav = resample(wav, sr, 16000)
    if args.w2v2_checkpoint.endswith(".pt"):
        from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
            load_pt_state_dict, wav2vec2_raw_tree_from_pt,
        )
        params = wav2vec2_raw_tree_from_pt(
            load_pt_state_dict(args.w2v2_checkpoint))
    else:
        params = load_params(args.w2v2_checkpoint)
    extractor = UnitExtractor(params, KmeansModel.from_npy(args.kmeans_path),
                              out_layer_idx=args.out_layer_number - 1)
    units = extractor.predict(wav)
    logger.info("Units: %s", " ".join(map(str, units[0])))


if __name__ == "__main__":
    main()
