"""FP32 codec-decoder (vocoder): [T, 16] int codes -> 24 kHz waveform.

Capability equivalent of the decoder half of the Qwen3-TTS speech tokenizer
v2 that the reference traces to ONNX (scripts/export_vocoder_traced.py:74-80):
16 codebooks, 1920 samples/token total upsampling, Snake activations
``x + sin^2(alpha*x)/alpha``, an NSF/SineGen harmonic source, and dilated
Conv1D residual stacks with dilation up to 9. The reference documents every
quantized variant as unusable (RKNN Q8 SNR 9.5 dB, ONNX INT8 SNR 4.2 dB —
README.md:56-64), so this module is pinned to float32 end to end.

TPU-native: convolutions are XLA ``conv_general_dilated`` in NWC layout
(TPU-native conv path, MXU-tiled), everything is fixed-shape per chunk
(64 tokens -> 122880 samples) so the whole decoder jits once; the
overlap-crossfade chunker (port of dual_npu/vocoder_server.py:73-121) runs
fixed-shape chunk programs and blends on device.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.config import (
    SAMPLES_PER_TOKEN,
    VOC_CHUNK_SIZE,
    VOC_OVERLAP,
    VocoderConfig,
)

Params = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation: x + sin^2(alpha * x) / alpha (per-channel alpha).

    The quantization-hostile periodic activation the reference pins to FP32
    (README.md:56-64). alpha broadcasts over (B, T, C) with shape (C,).
    """
    a = alpha[None, None, :]
    s = jnp.sin(a * x)
    return x + s * s / (a + 1e-9)


def conv1d(x: jax.Array, w: jax.Array, b: jax.Array, *,
           stride: int = 1, dilation: int = 1, padding: str = "SAME") -> jax.Array:
    """x: (B, T, Cin); w: (K, Cin, Cout). 'SAME'-style symmetric padding."""
    if padding == "SAME":
        k_eff = (w.shape[0] - 1) * dilation + 1
        pad_l = (k_eff - 1) // 2
        pad_r = k_eff - 1 - pad_l
        pads = [(pad_l, pad_r)]
    else:
        pads = [(0, 0)]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=pads,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return out + b[None, None, :]


def conv_transpose1d(x: jax.Array, w: jax.Array, b: jax.Array, *,
                     stride: int) -> jax.Array:
    """Transposed conv upsampling by exactly `stride`. x: (B, T, Cin);
    w: (K, Cin, Cout). Implemented as an lhs-dilated conv with padding
    chosen so output length == T * stride for any K >= stride (matches
    PyTorch ConvTranspose1d(k, s, padding=(k-s)/2) when k=2s)."""
    k = w.shape[0]
    total_pad = stride + k - 2
    pad_l = total_pad // 2
    pad_r = total_pad - pad_l
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad_l, pad_r)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return out + b[None, None, :]


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def init_vocoder_params(key: jax.Array, cfg: VocoderConfig) -> Params:
    """Random init. All float32 (FP32-only module)."""
    ks = iter(jax.random.split(key, 256))

    def w(shape, fan_in=None):
        fan = fan_in if fan_in is not None else int(np.prod(shape[:-1]))
        scale = 1.0 / math.sqrt(max(fan, 1))
        return jax.random.uniform(next(ks), shape, jnp.float32, -scale, scale)

    D = cfg.embed_dim
    p: Params = {
        # 16 codebook tables, summed (RVQ-style)
        "codebooks": w((cfg.num_codebooks, cfg.codebook_size, D)),
        "pre_w": w((7, D, D)), "pre_b": jnp.zeros((D,)),
        # F0 predictor: token-rate conv stack -> scalar f0 per frame
        "f0_w1": w((3, D, 64)), "f0_b1": jnp.zeros((64,)),
        "f0_w2": w((3, 64, 1)), "f0_b2": jnp.zeros((1,)),
        # source conv: harmonics+noise -> 1 channel
        "src_w": w((1, cfg.num_harmonics + 1, 1)), "src_b": jnp.zeros((1,)),
    }

    ch = [D]
    for _ in cfg.upsample_rates:
        ch.append(max(ch[-1] // 2, 8))

    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin, cout = ch[i], ch[i + 1]
        p[f"up{i}_alpha"] = jnp.ones((cin,))
        p[f"up{i}_w"] = w((k, cin, cout))
        p[f"up{i}_b"] = jnp.zeros((cout,))
        # NSF source injection at this resolution
        p[f"src{i}_w"] = w((2 * _stride_after(cfg, i) + 1, 1, cout))
        p[f"src{i}_b"] = jnp.zeros((cout,))
        for j, kr in enumerate(cfg.resblock_kernel_sizes):
            for d_i, dil in enumerate(cfg.resblock_dilations[j]):
                p[f"res{i}_{j}_{d_i}_alpha1"] = jnp.ones((cout,))
                p[f"res{i}_{j}_{d_i}_w1"] = w((kr, cout, cout))
                p[f"res{i}_{j}_{d_i}_b1"] = jnp.zeros((cout,))
                p[f"res{i}_{j}_{d_i}_alpha2"] = jnp.ones((cout,))
                p[f"res{i}_{j}_{d_i}_w2"] = w((kr, cout, cout))
                p[f"res{i}_{j}_{d_i}_b2"] = jnp.zeros((cout,))

    p["post_alpha"] = jnp.ones((ch[-1],))
    p["post_w"] = w((7, ch[-1], 1))
    p["post_b"] = jnp.zeros((1,))
    return p


def _stride_after(cfg: VocoderConfig, i: int) -> int:
    """Downsample factor from sample rate to the resolution after stage i."""
    s = 1
    for r in cfg.upsample_rates[i + 1:]:
        s *= r
    return s


# ---------------------------------------------------------------------------
# SineGen (NSF harmonic source)
# ---------------------------------------------------------------------------

def sine_source(params: Params, f0_frame: jax.Array, cfg: VocoderConfig,
                key: jax.Array) -> jax.Array:
    """f0_frame: (B, T) token-rate F0 in Hz -> (B, T*1920, 1) source signal.

    Phase-accumulated sine harmonics (cumsum of instantaneous frequency),
    voiced/unvoiced gating, and Gaussian noise — the SineGen contract the
    reference's NPU ports could not handle (README.md:62-63).
    """
    B, T = f0_frame.shape
    up = cfg.total_upsample
    sr = float(cfg.sample_rate)
    # nearest-neighbour upsample of f0 to sample rate
    f0 = jnp.repeat(f0_frame, up, axis=1)  # (B, N)
    harmonics = jnp.arange(1, cfg.num_harmonics + 1, dtype=jnp.float32)
    # phase accumulation per harmonic: 2*pi * cumsum(f0 * h / sr)
    inst = f0[:, :, None] * harmonics[None, None, :] / sr   # (B, N, Hh)
    phase = 2.0 * jnp.pi * jnp.cumsum(inst, axis=1)
    sines = jnp.sin(phase) * cfg.sine_amp
    voiced = (f0 > cfg.voiced_threshold).astype(jnp.float32)[:, :, None]
    noise = jax.random.normal(key, sines.shape, jnp.float32)
    src = sines * voiced + noise * (
        voiced * cfg.noise_std + (1.0 - voiced) * cfg.sine_amp / 3.0)
    # merge harmonics+noise-channel -> 1 channel
    merged = jnp.tanh(conv1d(
        jnp.concatenate([src, noise[:, :, :1]], axis=-1)[:, :, :cfg.num_harmonics + 1],
        params["src_w"], params["src_b"]))
    return merged  # (B, N, 1)


# ---------------------------------------------------------------------------
# Decoder forward
# ---------------------------------------------------------------------------

def decode(params: Params, codes: jax.Array, cfg: VocoderConfig,
           key: jax.Array | None = None) -> jax.Array:
    """codes: (B, T, 16) int32/int64 -> waveform (B, T*1920) float32 in [-1,1].

    Deterministic by default (key=None uses a fixed seed for the source
    noise so chunk decodes are reproducible).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    codes = codes.astype(jnp.int32)
    B, T, NQ = codes.shape

    # sum the 16 codebook embeddings (RVQ levels)
    cb = params["codebooks"]  # (16, V, D)
    x = jnp.sum(cb[jnp.arange(NQ)[None, None, :], codes], axis=2)  # (B, T, D)
    x = x.astype(jnp.float32)
    x = conv1d(x, params["pre_w"], params["pre_b"])

    # F0 prediction at token rate
    h = jax.nn.leaky_relu(conv1d(x, params["f0_w1"], params["f0_b1"]), 0.1)
    f0 = jax.nn.softplus(conv1d(h, params["f0_w2"], params["f0_b2"]))[:, :, 0]
    source = sine_source(params, f0, cfg, key)  # (B, N, 1)

    for i, r in enumerate(cfg.upsample_rates):
        x = snake(x, params[f"up{i}_alpha"])
        x = conv_transpose1d(x, params[f"up{i}_w"], params[f"up{i}_b"], stride=r)
        # inject the harmonic source, downsampled to this resolution
        s = _stride_after(cfg, i)
        src_i = conv1d(source, params[f"src{i}_w"], params[f"src{i}_b"], stride=s)
        x = x + src_i[:, :x.shape[1], :]
        # AMP residual stacks, averaged over kernel sizes
        acc = None
        for j, kr in enumerate(cfg.resblock_kernel_sizes):
            xb = x
            for d_i, dil in enumerate(cfg.resblock_dilations[j]):
                h = snake(xb, params[f"res{i}_{j}_{d_i}_alpha1"])
                h = conv1d(h, params[f"res{i}_{j}_{d_i}_w1"],
                           params[f"res{i}_{j}_{d_i}_b1"], dilation=dil)
                h = snake(h, params[f"res{i}_{j}_{d_i}_alpha2"])
                h = conv1d(h, params[f"res{i}_{j}_{d_i}_w2"],
                           params[f"res{i}_{j}_{d_i}_b2"])
                xb = xb + h
            acc = xb if acc is None else acc + xb
        x = acc / len(cfg.resblock_kernel_sizes)

    x = snake(x, params["post_alpha"])
    x = conv1d(x, params["post_w"], params["post_b"])
    wav = jnp.tanh(x)[:, :, 0]
    return wav  # (B, T*1920)


# ---------------------------------------------------------------------------
# Chunked synthesis with overlap-crossfade
# ---------------------------------------------------------------------------

def synthesize_chunked(
    decode_fn,
    codes: np.ndarray,          # (T, 16) host array
    max_tokens: int = VOC_CHUNK_SIZE,
    overlap: int = VOC_OVERLAP,
) -> np.ndarray:
    """Port of the reference multi-chunk overlap-crossfade
    (dual_npu/vocoder_server.py:73-121).

    ``decode_fn`` is a jitted fixed-shape chunk decoder taking
    (1, max_tokens, 16) int32 and returning (1, max_tokens*1920) float32.
    Single chunk: zero-pad, decode, trim. Multi-chunk: advance by
    ``max_tokens - overlap`` tokens; linear fade-out/fade-in blend over the
    overlap region.
    """
    n_tokens = len(codes)
    spt = SAMPLES_PER_TOKEN

    def dispatch(chunk: np.ndarray):
        c = np.zeros((1, max_tokens, 16), np.int32)
        c[0, :len(chunk), :] = chunk[:, :16]
        return decode_fn(c), len(chunk)  # async device value

    if n_tokens <= max_tokens:
        fut, m = dispatch(codes)
        return np.asarray(fut)[0][:m * spt]

    step = max_tokens - overlap
    ov_samples = overlap * spt
    fade_out = np.linspace(1.0, 0.0, ov_samples, dtype=np.float32)
    fade_in = 1.0 - fade_out

    # dispatch every chunk before fetching any: jitted calls are async, so
    # the per-invocation dispatch latency (~60 ms through the tunneled
    # runtime — 3x the chunk's device time) pipelines instead of
    # serializing. Crossfade happens on host as results land, in order.
    futs = [dispatch(codes[cs:min(cs + max_tokens, n_tokens)])
            for cs in range(0, n_tokens, step)]

    result = np.array([], dtype=np.float32)
    for i, (fut, m) in enumerate(futs):
        audio_chunk = np.asarray(fut)[0][:m * spt]
        if i == 0:
            result = audio_chunk
        elif len(result) >= ov_samples and len(audio_chunk) >= ov_samples:
            blended = (result[-ov_samples:] * fade_out
                       + audio_chunk[:ov_samples] * fade_in)
            result = np.concatenate(
                [result[:-ov_samples], blended, audio_chunk[ov_samples:]])
        else:
            result = np.concatenate([result, audio_chunk])
    return result


def to_int16(audio: np.ndarray) -> np.ndarray:
    """float [-1,1] -> int16 with the reference's clip (vocoder_server.py:175)."""
    return np.clip(audio * 32767, -32768, 32767).astype(np.int16)
