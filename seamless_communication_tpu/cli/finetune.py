"""m4t_finetune CLI (reference cli/m4t/finetune/finetune.py:29-221): data-parallel
(+ optional tensor-parallel) finetuning over a jax Mesh instead of torchrun/DDP."""

from __future__ import annotations

import argparse
import logging

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("m4t_finetune")


def main() -> None:
    parser = argparse.ArgumentParser(description="M4T finetuning on TPU")
    parser.add_argument("--train_dataset", type=str, required=True,
                        help="train manifest JSON (fbank/text pairs)")
    parser.add_argument("--eval_dataset", type=str, default=None)
    parser.add_argument("--model_name", type=str, default="seamlessM4T_v2_large")
    parser.add_argument("--save_model_to", type=str, default="checkpoint")
    parser.add_argument("--mode", type=str, default="SPEECH_TO_TEXT",
                        choices=["SPEECH_TO_SPEECH", "SPEECH_TO_TEXT",
                                 "TEXT_TO_SPEECH"])
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--learning_rate", type=float, default=1e-7)
    parser.add_argument("--warmup_steps", type=int, default=100)
    parser.add_argument("--max_epochs", type=int, default=10)
    parser.add_argument("--patience", type=int, default=3)
    parser.add_argument("--eval_steps", type=int, default=50)
    parser.add_argument("--log_steps", type=int, default=10)
    parser.add_argument("--label_smoothing", type=float, default=0.2)
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="0 = all devices")
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument("--pipeline_parallel", type=int, default=1,
                        help="GPipe pipeline stages over a 'pipe' mesh axis "
                             "(parallel/pipeline.py); layer counts must "
                             "divide it")
    parser.add_argument("--pp_microbatches", type=int, default=2,
                        help="microbatches per pipeline step (bubble = "
                             "(S-1)/(m+S-1)); batch_size must divide "
                             "data_parallel * pp_microbatches")
    parser.add_argument("--freeze_text_encoder", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="--no-freeze_text_encoder unfreezes it")
    parser.add_argument("--freeze_speech_encoder", action="store_true")
    parser.add_argument("--local_hf_path", type=str, default=None)
    parser.add_argument("--remat", action="store_true",
                        help="recompute layer activations in backward "
                             "(jax.checkpoint) to fit bigger batches/models")
    parser.add_argument("--resume", type=str, default=None,
                        help="restore a full train-state checkpoint written by "
                             "--save_state_to (params + optimizer + counters; "
                             "beyond the reference, which only saves the best "
                             "model)")
    parser.add_argument("--save_state_to", type=str, default=None,
                        help="write a resumable full train-state checkpoint "
                             "when training ends")
    parser.add_argument("--init_speech_encoder", type=str, default=None,
                        help="path to a standalone conformer-shaw .pt "
                             "(cards/conformer_shaw.yaml): initialize the "
                             "speech encoder's conformer stack + frontend "
                             "projection from the pretrained checkpoint "
                             "(reference models/conformer_shaw/loader.py)")
    args = parser.parse_args()

    import jax

    from seamless_communication_tpu.cli.loading import load_unity_model_and_tokenizers
    from seamless_communication_tpu.datasets.loader import manifest_batches
    from seamless_communication_tpu.parallel.sharding import make_mesh
    from seamless_communication_tpu.train.trainer import (
        FinetuneMode, FinetuneParams, UnitYFinetune,
    )

    params, cfg, text_tok, unit_tok, char_tok = load_unity_model_and_tokenizers(
        args.model_name, local_hf_path=args.local_hf_path)

    if args.init_speech_encoder:
        from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
            init_speech_encoder_from_conformer_shaw, load_pt_state_dict,
        )
        logger.info("initializing speech encoder from %s",
                    args.init_speech_encoder)
        params = init_speech_encoder_from_conformer_shaw(
            params, load_pt_state_dict(args.init_speech_encoder))

    pp = args.pipeline_parallel
    dp = args.data_parallel or (len(jax.devices())
                                // (args.model_parallel * pp))
    mesh = make_mesh(data=dp, model=args.model_parallel, pipe=pp)
    logger.info("mesh: data=%d model=%d pipe=%d", dp, args.model_parallel, pp)

    ft = FinetuneParams(
        finetune_mode=FinetuneMode(args.mode),
        save_model_path=args.save_model_to,
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        max_epochs=args.max_epochs, patience=args.patience,
        eval_steps=args.eval_steps, log_steps=args.log_steps,
        label_smoothing=args.label_smoothing,
        freeze_text_encoder=args.freeze_text_encoder,
        freeze_speech_encoder=args.freeze_speech_encoder,
        remat=args.remat,
        pp_microbatches=args.pp_microbatches if pp > 1 else 0)

    # S2S manifests: AR-T2U archs (v1) train on target.units
    # (m4t_prepare_dataset --extract_units); NAR-T2U archs (v2) additionally
    # need the aligner-derived target.char_durations (--aligner_pt) and the
    # card's char tokenizer for the host char frontend.
    load_units = ft.finetune_mode == FinetuneMode.SPEECH_TO_SPEECH
    nar_char_tok = None
    if load_units and cfg.ar_t2u is None:
        if char_tok is None:
            parser.error("NAR-T2U S2S finetuning needs the card's "
                         "char_tokenizer (spm_char_lang38_tc.model)")
        nar_char_tok = char_tok
    train_data = manifest_batches(args.train_dataset, text_tok,
                                  batch_size=args.batch_size,
                                  load_units=load_units,
                                  char_tokenizer=nar_char_tok)
    eval_data = (manifest_batches(args.eval_dataset, text_tok,
                                  batch_size=args.batch_size,
                                  load_units=load_units,
                                  char_tokenizer=nar_char_tok)
                 if args.eval_dataset else None)
    trainer = UnitYFinetune(params, cfg, ft, mesh=mesh, train_data=train_data,
                            eval_data=eval_data)
    step0 = trainer.restore_state(args.resume) if args.resume else 0
    final_step = step0
    try:
        final_step = trainer.run(start_step=step0) or step0
    finally:
        if args.save_state_to:
            trainer.save_state(args.save_state_to, step_nr=final_step)


if __name__ == "__main__":
    main()
