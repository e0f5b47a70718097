"""Speech-tokenizer *encoder*: waveform -> [T, 16] codec tokens.

Voice-cloning prep capability (reference scripts/encode_reference_audio.py:
60-117 uses the qwen-tts package's official encoder; its source is not
public). This is the structural mirror of the verified decoder
(models/vocoder.py, the public ``Qwen3OmniMoeCode2Wav`` architecture), run
in reverse:

  wav (B, N) -> causal conv k7 (1 -> decoder_dim/2^4 channels)
  -> 4 strided blocks [3 residual units (d=1,3,9), SnakeBeta,
     causal conv k=2r stride=r] with channel doubling, rates
     (3, 4, 5, 8) = the decoder's upsample_rates reversed
  -> causal conv k7 -> hidden_size
  -> 2 ConvNeXt downsampling stages (stride-2 causal convs)
  -> sliding-window transformer (post_transformer) + final RMSNorm
  -> latent (B, T, H), N = 1920 * T
  -> 16-stage residual VQ against the *decoder's* per-quantizer codebooks
     (vocoder ``code_embedding`` reshaped to (16, V, H)), so
     encode -> decode round-trips are consistent by construction.

The block plan and tensor names are EXTRAPOLATED (mirror grammar of the
decoder's verified names, under the checkpoint's ``encoder.`` prefix); the
loader is strict, so a real checkpoint with different naming fails loudly
instead of silently producing garbage prompts. FP32 end to end.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.config import EncoderConfig, VocoderConfig
from qwen3_tts_tpu.models.vocoder import (
    causal_conv1d,
    convnext_block,
    pre_transformer,
    residual_unit,
    snake_beta,
)

Params = Dict[str, jax.Array]


def decoder_codebooks(voc_params: Params, voc_cfg: VocoderConfig) -> jax.Array:
    """The decoder's 16 per-quantizer codebooks, (16, V, H), sliced from
    its flat ``code_embedding`` (offset layout: quantizer q owns rows
    [q*V, (q+1)*V))."""
    nq, v = voc_cfg.num_codebooks, voc_cfg.codebook_size
    return voc_params["code_embedding"].reshape(nq, v, -1)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _channel_plan(cfg: EncoderConfig):
    """Mirror of the decoder: blocks double channels from
    decoder_dim / 2^n_blocks up to decoder_dim."""
    n = len(cfg.downsample_rates)
    return [cfg.decoder_dim // (2 ** (n - i)) for i in range(n + 1)]


def init_encoder_params(key: jax.Array, cfg: EncoderConfig) -> Params:
    ks = iter(jax.random.split(key, 512))

    def w(shape, fan_in=None):
        fan = fan_in if fan_in is not None else int(np.prod(shape[:-1]))
        s = 1.0 / math.sqrt(max(fan, 1))
        return jax.random.uniform(next(ks), shape, jnp.float32, -s, s)

    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    ch = _channel_plan(cfg)

    p: Params = {
        "enc_in_w": w((7, 1, ch[0])), "enc_in_b": jnp.zeros((ch[0],)),
        "blocks": {},
    }
    for i, r in enumerate(cfg.downsample_rates):
        cin, cout = ch[i], ch[i + 1]
        blk = {"res": {}, "alpha": jnp.zeros((cin,)),
               "beta": jnp.zeros((cin,)),
               "down_w": w((2 * r, cin, cout)), "down_b": jnp.zeros((cout,))}
        for d_i in range(3):
            blk["res"][str(d_i)] = {
                "alpha1": jnp.zeros((cin,)), "beta1": jnp.zeros((cin,)),
                "conv1_w": w((7, cin, cin)), "conv1_b": jnp.zeros((cin,)),
                "alpha2": jnp.zeros((cin,)), "beta2": jnp.zeros((cin,)),
                "conv2_w": w((1, cin, cin)), "conv2_b": jnp.zeros((cin,)),
            }
        p["blocks"][str(i)] = blk
    p["enc_out_w"] = w((7, ch[-1], H))
    p["enc_out_b"] = jnp.zeros((H,))
    p["downsample"] = {}
    for i, f in enumerate(cfg.downsampling_ratios):
        p["downsample"][str(i)] = {
            "cn_dw_w": w((7, 1, H)), "cn_dw_b": jnp.zeros((H,)),
            "cn_ln_w": jnp.ones((H,)), "cn_ln_b": jnp.zeros((H,)),
            "cn_pw1_w": w((H, 4 * H)), "cn_pw1_b": jnp.zeros((4 * H,)),
            "cn_pw2_w": w((4 * H, H)), "cn_pw2_b": jnp.zeros((H,)),
            "cn_gamma": jnp.full((H,), 1e-6),
            "down_w": w((f, H, H)), "down_b": jnp.zeros((H,)),
        }
    layers = {
        "input_ln": jnp.ones((L, H)), "post_ln": jnp.ones((L, H)),
        "q_proj": w((L, H, H)), "k_proj": w((L, H, H)),
        "v_proj": w((L, H, H)), "o_proj": w((L, H, H)),
        "gate_proj": w((L, H, I)), "up_proj": w((L, H, I)),
        "down_proj": w((L, I, H)),
        "attn_scale": jnp.full((L, H), cfg.layer_scale_initial_scale),
        "mlp_scale": jnp.full((L, H), cfg.layer_scale_initial_scale),
    }
    p["post"] = {"layers": layers, "norm": jnp.ones((H,))}
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def encode_features(params: Params, wav: jax.Array,
                    cfg: EncoderConfig) -> jax.Array:
    """wav: (B, N) float32 in [-1,1], N divisible by total_downsample
    (=1920) -> (B, N/1920, H) latent frames."""
    x = wav[:, :, None].astype(jnp.float32)
    x = causal_conv1d(x, params["enc_in_w"], params["enc_in_b"])
    for i, r in enumerate(cfg.downsample_rates):
        blk = params["blocks"][str(i)]
        for d_i, dil in enumerate((1, 3, 9)):
            x = residual_unit(blk["res"][str(d_i)], x, dil)
        x = snake_beta(x, blk["alpha"], blk["beta"])
        x = causal_conv1d(x, blk["down_w"], blk["down_b"], stride=r)
    x = causal_conv1d(x, params["enc_out_w"], params["enc_out_b"])
    for i, f in enumerate(cfg.downsampling_ratios):
        st = params["downsample"][str(i)]
        x = convnext_block(st, x)
        x = causal_conv1d(x, st["down_w"], st["down_b"], stride=f)
    # the transformer geometry mirrors the decoder's pre_transformer
    return pre_transformer(params["post"], x, cfg)


def rvq_encode(codebooks: jax.Array, z: jax.Array) -> jax.Array:
    """Residual VQ against the decoder's 16 codebooks.

    codebooks: (16, V, H) (``decoder_codebooks``); z: (B, T, H) latent
    whose decode-side reconstruction is mean_q cb_q[code_q]
    (models/vocoder.decode_raw), so the RVQ target is sum_q = 16 * z.
    Returns codes (B, T, 16) int32 minimizing the residual greedily."""
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

    target = z.astype(jnp.float32) * nq
    _, codes = jax.lax.scan(stage, target, codebooks)
    return jnp.moveaxis(codes, 0, -1)  # (B, T, 16)


def encode(enc_params: Params, codebooks: jax.Array, wav: jax.Array,
           cfg: EncoderConfig) -> jax.Array:
    """Full path: waveform -> latent -> RVQ codes (B, T, 16)."""
    z = encode_features(enc_params, wav, cfg)
    return rvq_encode(codebooks, z)


# ---------------------------------------------------------------------------
# Checkpoint loading (strict, mirror naming — see module docstring)
# ---------------------------------------------------------------------------

def load_encoder_from_state_dict(sd: Dict[str, np.ndarray],
                                 cfg: EncoderConfig) -> Params:
    """Map ``encoder.``-stripped speech-tokenizer tensors into the encoder
    pytree. Key grammar mirrors the decoder's verified torch naming
    (io/weights.load_vocoder_from_state_dict); strict on both missing and
    unconsumed tensors."""
    from qwen3_tts_tpu.io.weights import _conv_w  # torch OIW -> WIO

    used = set()

    def get(k: str) -> np.ndarray:
        if k not in sd:
            raise KeyError(f"encoder checkpoint missing tensor: {k!r}")
        used.add(k)
        return np.asarray(sd[k], np.float32)

    L = cfg.num_hidden_layers

    def stack(fmt: str, transpose: bool) -> jnp.ndarray:
        arrs = [get(fmt.format(i=i)) for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs), jnp.float32)

    p: Params = {
        "enc_in_w": _conv_w(get("encoder.0.conv.weight")),
        "enc_in_b": jnp.asarray(get("encoder.0.conv.bias"), jnp.float32),
        "blocks": {},
    }
    n_blocks = len(cfg.downsample_rates)
    for i in range(n_blocks):
        d = f"encoder.{i + 1}.block."
        blk = {"res": {}}
        for d_i in range(3):
            r = d + f"{d_i}."
            blk["res"][str(d_i)] = {
                "alpha1": jnp.asarray(get(r + "act1.alpha"), jnp.float32),
                "beta1": jnp.asarray(get(r + "act1.beta"), jnp.float32),
                "conv1_w": _conv_w(get(r + "conv1.conv.weight")),
                "conv1_b": jnp.asarray(get(r + "conv1.conv.bias"),
                                       jnp.float32),
                "alpha2": jnp.asarray(get(r + "act2.alpha"), jnp.float32),
                "beta2": jnp.asarray(get(r + "act2.beta"), jnp.float32),
                "conv2_w": _conv_w(get(r + "conv2.conv.weight")),
                "conv2_b": jnp.asarray(get(r + "conv2.conv.bias"),
                                       jnp.float32),
            }
        blk["alpha"] = jnp.asarray(get(d + "3.alpha"), jnp.float32)
        blk["beta"] = jnp.asarray(get(d + "3.beta"), jnp.float32)
        blk["down_w"] = _conv_w(get(d + "4.conv.weight"))
        blk["down_b"] = jnp.asarray(get(d + "4.conv.bias"), jnp.float32)
        p["blocks"][str(i)] = blk
    p["enc_out_w"] = _conv_w(get(f"encoder.{n_blocks + 1}.conv.weight"))
    p["enc_out_b"] = jnp.asarray(get(f"encoder.{n_blocks + 1}.conv.bias"),
                                 jnp.float32)
    p["downsample"] = {}
    for i in range(len(cfg.downsampling_ratios)):
        u = f"downsample.{i}."
        p["downsample"][str(i)] = {
            "cn_dw_w": _conv_w(get(u + "0.dwconv.conv.weight")),
            "cn_dw_b": jnp.asarray(get(u + "0.dwconv.conv.bias"),
                                   jnp.float32),
            "cn_ln_w": jnp.asarray(get(u + "0.norm.weight"), jnp.float32),
            "cn_ln_b": jnp.asarray(get(u + "0.norm.bias"), jnp.float32),
            "cn_pw1_w": jnp.asarray(get(u + "0.pwconv1.weight").T,
                                    jnp.float32),
            "cn_pw1_b": jnp.asarray(get(u + "0.pwconv1.bias"), jnp.float32),
            "cn_pw2_w": jnp.asarray(get(u + "0.pwconv2.weight").T,
                                    jnp.float32),
            "cn_pw2_b": jnp.asarray(get(u + "0.pwconv2.bias"), jnp.float32),
            "cn_gamma": jnp.asarray(get(u + "0.gamma"), jnp.float32),
            "down_w": _conv_w(get(u + "1.conv.weight")),
            "down_b": jnp.asarray(get(u + "1.conv.bias"), jnp.float32),
        }
    pre = "post_transformer.layers.{i}."
    p["post"] = {
        "layers": {
            "input_ln": stack(pre + "input_layernorm.weight", False),
            "post_ln": stack(pre + "post_attention_layernorm.weight", False),
            "q_proj": stack(pre + "self_attn.q_proj.weight", True),
            "k_proj": stack(pre + "self_attn.k_proj.weight", True),
            "v_proj": stack(pre + "self_attn.v_proj.weight", True),
            "o_proj": stack(pre + "self_attn.o_proj.weight", True),
            "gate_proj": stack(pre + "mlp.gate_proj.weight", True),
            "up_proj": stack(pre + "mlp.up_proj.weight", True),
            "down_proj": stack(pre + "mlp.down_proj.weight", True),
            "attn_scale": stack(pre + "self_attn_layer_scale.scale", False),
            "mlp_scale": stack(pre + "mlp_layer_scale.scale", False),
        },
        "norm": jnp.asarray(get("post_transformer.norm.weight"), jnp.float32),
    }

    unused = set(sd) - used
    if unused:
        raise ValueError(
            "encoder checkpoint has tensors the loader did not consume "
            f"(architecture mismatch?): {sorted(unused)[:10]}"
            f"{' ...' if len(unused) > 10 else ''}")
    return p


# ---------------------------------------------------------------------------
# Host-side audio prep helpers
# ---------------------------------------------------------------------------

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
