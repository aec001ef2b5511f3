"""MuToX speech toxicity pipeline (reference
toxicity/mutox/speech_pipeline.py:31-62): audio -> sentence embedding (SONAR
speech encoder) -> MLP classifier -> toxicity logit per utterance.

The SONAR encoders live in Meta's separate ``sonar`` package, not in the
reference repo, so the embedder here is a PLUG-IN with a documented contract:

    embedder(waveforms: Sequence[np.ndarray 16 kHz mono]) -> (B, input_size)

Three ways to provide one:
  1. any Python callable honoring the contract (e.g. for tests, or a JAX
     encoder of your own);
  2. ``sonar_torchscript_embedder(path)`` — wraps a TorchScript-exported SONAR
     speech encoder file when the user has one;
  3. the ``sonar`` pip package when installed —
     ``sonar_package_embedder(encoder_name)``.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np

from seamless_communication_tpu.toxicity.mutox import MutoxClassifier, MutoxConfig


def sonar_torchscript_embedder(path: str, *, device: str = "cpu"
                               ) -> Callable[[Sequence], np.ndarray]:
    """Wrap a TorchScript-exported SONAR speech encoder (waveform (1, T) ->
    (1, 1024) sentence embedding)."""
    import torch

    model = torch.jit.load(path, map_location=device)
    model.eval()

    def embed(wavs: Sequence) -> np.ndarray:
        out = []
        with torch.no_grad():
            for w in wavs:
                t = torch.from_numpy(np.asarray(w, np.float32))[None]
                out.append(model(t).squeeze(0).cpu().numpy())
        return np.stack(out)

    return embed


def sonar_package_embedder(encoder_name: str = "sonar_speech_encoder_eng", *,
                           device: str = "cpu"
                           ) -> Callable[[Sequence], np.ndarray]:
    """Use Meta's ``sonar`` package when installed (the reference pipeline's
    own path, speech_pipeline.py:42-53)."""
    import torch
    from sonar.inference_pipelines.speech import SpeechToEmbeddingModelPipeline

    pipe = SpeechToEmbeddingModelPipeline(encoder=encoder_name,
                                          device=torch.device(device))

    def embed(wavs: Sequence) -> np.ndarray:
        import torch as _t
        tensors = [_t.from_numpy(np.asarray(w, np.float32))[None] for w in wavs]
        return pipe.predict(tensors).cpu().numpy()

    return embed


class MutoxSpeechPipeline:
    """audio -> embeddings -> toxicity logits, batched."""

    def __init__(self, classifier: MutoxClassifier,
                 embedder: Callable[[Sequence], np.ndarray]):
        self.classifier = classifier
        self.embedder = embedder

    @classmethod
    def from_files(cls, classifier_pt: str, sonar_torchscript: str,
                   cfg: MutoxConfig = MutoxConfig()) -> "MutoxSpeechPipeline":
        """Build from a reference mutox .pt checkpoint + a TorchScript SONAR
        encoder (the offline-friendly counterpart of
        MutoxSpeechClassifierPipeline.load_model_from_name)."""
        from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
            load_pt_state_dict, mutox_tree_from_pt,
        )
        params = mutox_tree_from_pt(load_pt_state_dict(classifier_pt))
        return cls(MutoxClassifier(params, cfg),
                   sonar_torchscript_embedder(sonar_torchscript))

    def predict(self, wavs: Sequence, *, batch_size: int = 8) -> np.ndarray:
        """16 kHz mono waveforms -> (B,) toxicity logits (sigmoid for prob)."""
        logits: List[np.ndarray] = []
        for i in range(0, len(wavs), batch_size):
            emb = self.embedder(wavs[i:i + batch_size])
            logits.append(np.asarray(
                self.classifier.predict(None, lambda _: emb)))
        return np.concatenate(logits) if logits else np.zeros((0,), np.float32)
