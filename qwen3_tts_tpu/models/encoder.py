"""Speech-tokenizer *encoder*: waveform -> [T, 16] codec tokens.

Voice-cloning prep capability (reference scripts/encode_reference_audio.py:
60-117 uses the qwen-tts package's tokenizer encoder; this is our native
equivalent). Mirror of the vocoder/decoder: strided Conv1D downsampling by
the same 1920x factor, then a 16-stage residual vector quantizer whose
codebooks are *shared with the decoder* (models/vocoder.py sums the same 16
codebook tables), so encode -> decode round-trips are consistent by
construction.

FP32 end to end, like the decoder.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.config import EncoderConfig, VocoderConfig
from qwen3_tts_tpu.models.vocoder import conv1d, snake

Params = Dict[str, jax.Array]


def init_encoder_params(key: jax.Array, cfg: EncoderConfig) -> Params:
    ks = iter(jax.random.split(key, 64))

    def w(shape):
        fan = int(np.prod(shape[:-1]))
        s = 1.0 / math.sqrt(max(fan, 1))
        return jax.random.uniform(next(ks), shape, jnp.float32, -s, s)

    D = cfg.embed_dim
    ch = [max(D // (2 ** (len(cfg.downsample_rates) - i)), 8)
          for i in range(len(cfg.downsample_rates))] + [D]
    p: Params = {"pre_w": w((7, 1, ch[0])), "pre_b": jnp.zeros((ch[0],))}
    for i, (r, k) in enumerate(zip(cfg.downsample_rates, cfg.kernel_sizes)):
        p[f"down{i}_alpha"] = jnp.ones((ch[i],))
        p[f"down{i}_w"] = w((k, ch[i], ch[i + 1]))
        p[f"down{i}_b"] = jnp.zeros((ch[i + 1],))
    p["post_alpha"] = jnp.ones((D,))
    p["post_w"] = w((3, D, D))
    p["post_b"] = jnp.zeros((D,))
    return p


def encode_features(params: Params, wav: jax.Array,
                    cfg: EncoderConfig) -> jax.Array:
    """wav: (B, N) float32 in [-1,1], N divisible by 1920 ->
    (B, N/1920, D) latent frames."""
    x = wav[:, :, None].astype(jnp.float32)
    x = conv1d(x, params["pre_w"], params["pre_b"])
    for i, r in enumerate(cfg.downsample_rates):
        x = snake(x, params[f"down{i}_alpha"])
        x = conv1d(x, params[f"down{i}_w"], params[f"down{i}_b"], stride=r)
    x = snake(x, params["post_alpha"])
    x = conv1d(x, params["post_w"], params["post_b"])
    return x


def rvq_encode(codebooks: jax.Array, z: jax.Array) -> jax.Array:
    """Residual VQ against the decoder's 16 codebooks.

    codebooks: (16, V, D) (the same tables models/vocoder.decode sums);
    z: (B, T, D). Returns codes (B, T, 16) int32 minimizing the residual
    greedily per stage.
    """
    nq = codebooks.shape[0]

    def stage(carry, cb):
        resid = carry
        # nearest neighbour by L2: argmin ||r - c||^2 = argmin -2 r.c + |c|^2
        dots = jnp.einsum("btd,vd->btv", resid, cb,
                          preferred_element_type=jnp.float32)
        norms = jnp.sum(cb.astype(jnp.float32) ** 2, axis=-1)
        idx = jnp.argmin(norms[None, None, :] - 2.0 * dots, axis=-1)
        resid = resid - cb[idx]
        return resid, idx.astype(jnp.int32)

    _, codes = jax.lax.scan(stage, z.astype(jnp.float32), codebooks)
    return jnp.moveaxis(codes, 0, -1)  # (B, T, 16)


def encode(enc_params: Params, codebooks: jax.Array, wav: jax.Array,
           cfg: EncoderConfig) -> jax.Array:
    """Full path: waveform -> latent -> RVQ codes (B, T, 16)."""
    z = encode_features(enc_params, wav, cfg)
    return rvq_encode(codebooks, z)


def pad_to_tokens(wav: np.ndarray, samples_per_token: int = 1920) -> np.ndarray:
    """Zero-pad a host waveform to a whole number of tokens."""
    n = len(wav)
    pad = (-n) % samples_per_token
    if pad:
        wav = np.concatenate([wav, np.zeros(pad, np.float32)])
    return wav


def resample_linear(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Minimal linear resampler for reference-audio prep (host-side)."""
    if sr_in == sr_out:
        return wav.astype(np.float32)
    n_out = int(round(len(wav) * sr_out / sr_in))
    x_out = np.linspace(0.0, len(wav) - 1, n_out)
    return np.interp(x_out, np.arange(len(wav)), wav).astype(np.float32)
