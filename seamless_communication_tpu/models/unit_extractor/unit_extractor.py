"""UnitExtractor: waveform -> XLSR layer-35 features -> kmeans-10k units
(reference models/unit_extractor/unit_extractor.py:37-112, kmeans.py:14-30)."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.unit_extractor.wav2vec2_raw import (
    Wav2Vec2RawConfig, wav2vec2_layer_output,
)


class KmeansModel:
    """Nearest-centroid quantizer: argmin ||x - c||^2 via -2xC + ||C||^2
    (reference kmeans.py:25-30)."""

    def __init__(self, centroids: np.ndarray):
        # (K, D) centroids
        self.centroids = jnp.asarray(centroids, jnp.float32).T          # (D, K)
        self.centroid_norm = jnp.sum(self.centroids ** 2, axis=0)[None]  # (1, K)

    @classmethod
    def from_npy(cls, path: str) -> "KmeansModel":
        return cls(np.load(path))

    def __call__(self, x: jax.Array) -> jax.Array:
        dist = (jnp.sum(x ** 2, axis=-1, keepdims=True)
                - 2.0 * jnp.matmul(x, self.centroids,
                                   preferred_element_type=jnp.float32)
                + self.centroid_norm)
        return jnp.argmin(dist, axis=-1)


class UnitExtractor:
    def __init__(self, w2v2_params: dict, kmeans: KmeansModel,
                 cfg: Wav2Vec2RawConfig = Wav2Vec2RawConfig(), *,
                 out_layer_idx: int = 34):
        self.params = w2v2_params
        self.kmeans = kmeans
        self.cfg = cfg
        self.out_layer_idx = out_layer_idx
        self._fn = jax.jit(self._predict)

    def _predict(self, params, wav, lengths):
        # layer-norm the raw waveform (reference unit_extractor.py:94)
        mean = jnp.mean(wav, axis=-1, keepdims=True)
        var = jnp.var(wav, axis=-1, keepdims=True)
        wav = (wav - mean) * jax.lax.rsqrt(var + 1e-5)
        feats, out_lens = wav2vec2_layer_output(params, wav, lengths, self.cfg,
                                                out_layer_idx=self.out_layer_idx)
        return self.kmeans(feats), out_lens

    def predict(self, waveform: np.ndarray, sample_lengths: Optional[np.ndarray] = None
                ) -> list:
        wav = np.atleast_2d(np.asarray(waveform, np.float32))
        lens = (np.asarray(sample_lengths, np.int32) if sample_lengths is not None
                else np.full((wav.shape[0],), wav.shape[1], np.int32))
        units, out_lens = self._fn(self.params, jnp.asarray(wav), jnp.asarray(lens))
        units = np.asarray(units)
        return [units[b, :int(out_lens[b])].tolist() for b in range(wav.shape[0])]

    def resynthesize_audio(self, units: list, vocoder_fn, tgt_lang: str,
                           spkr: int = -1):
        """Units -> waveform via a provided vocoder callable
        (reference unit_extractor.py:101-112)."""
        return vocoder_fn(units, tgt_lang, spkr)
