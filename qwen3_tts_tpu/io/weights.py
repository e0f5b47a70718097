"""Weight loading: HF safetensors -> JAX pytrees, plus a native NPZ
checkpoint format.

Replaces the reference's entire model-prep toolchain (scripts 12-17 in
SURVEY §2: GGUF conversion, npy/npz extraction, ONNX export) with a direct
HF-checkpoint -> device-array path. Weight matrices are transposed once at
load from HF's (out, in) to our (in, out) so every hot matmul is x @ W.

Key mapping reproduces the reference extraction scripts:
- talker transformer: ``talker.model.layers.{i}.*``
  (scripts/extract_talker_as_qwen3.py:53-75)
- embedding surface: ``talker.model.text_embedding.weight``,
  ``talker.text_projection.linear_fc{1,2}.{weight,bias}``,
  ``talker.model.codec_embedding.weight``, ``talker.codec_head.weight``
  (scripts/extract_embeddings.py:47-70)
- code predictor: ``talker.code_predictor.model.layers.{i}.*``,
  ``talker.code_predictor.model.codec_embedding.{g}.weight``,
  ``talker.code_predictor.lm_head.{g}.weight``,
  ``talker.code_predictor.small_to_mtp_projection.*``
  (scripts/export_code_predictor_weights.py:51-74,
  scripts/export_code_predictor_onnx.py:38-46)
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.config import CodePredictorConfig, TalkerConfig, TTSConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Generic pytree <-> npz (native checkpoint format)
# ---------------------------------------------------------------------------

def save_pytree_npz(path: str, tree: Params) -> None:
    flat = {}

    def rec(prefix, node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", tree)
    np.savez(path, **flat)


def load_pytree_npz(path: str, dtype=None) -> Params:
    data = np.load(path)
    tree: Params = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            node[parts[-1]] = jnp.asarray(arr, dtype)
        else:
            node[parts[-1]] = jnp.asarray(arr)
    return tree


# ---------------------------------------------------------------------------
# HF safetensors loading
# ---------------------------------------------------------------------------

def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a .safetensors file (numpy backend, no torch)."""
    from safetensors.numpy import load_file
    return load_file(path)


def _stack_layers(get: Callable[[str], np.ndarray], prefix: str,
                  num_layers: int, dtype) -> Params:
    """Build the stacked layer pytree from per-layer HF tensors."""
    def t(name):  # (out,in) -> (in,out), stacked over layers
        return jnp.asarray(
            np.stack([get(f"{prefix}.{i}.{name}").T for i in range(num_layers)]),
            dtype)

    def raw(name):
        return jnp.asarray(
            np.stack([get(f"{prefix}.{i}.{name}") for i in range(num_layers)]),
            dtype)

    return {
        "input_ln": raw("input_layernorm.weight"),
        "q_proj": t("self_attn.q_proj.weight"),
        "k_proj": t("self_attn.k_proj.weight"),
        "v_proj": t("self_attn.v_proj.weight"),
        "o_proj": t("self_attn.o_proj.weight"),
        "q_norm": raw("self_attn.q_norm.weight"),
        "k_norm": raw("self_attn.k_norm.weight"),
        "post_ln": raw("post_attention_layernorm.weight"),
        "gate_proj": t("mlp.gate_proj.weight"),
        "up_proj": t("mlp.up_proj.weight"),
        "down_proj": t("mlp.down_proj.weight"),
    }


def load_talker_from_hf(weights: Dict[str, np.ndarray], cfg: TalkerConfig,
                        dtype=jnp.bfloat16) -> Params:
    """Map the HF Qwen3-TTS checkpoint's talker tensors into our pytree."""
    get = lambda k: weights[k]
    return {
        "layers": _stack_layers(get, "talker.model.layers", cfg.num_layers, dtype),
        "final_norm": jnp.asarray(get("talker.model.norm.weight"), dtype),
        "text_embedding": jnp.asarray(
            get("talker.model.text_embedding.weight"), dtype),
        "proj_fc1_w": jnp.asarray(
            get("talker.text_projection.linear_fc1.weight").T, dtype),
        "proj_fc1_b": jnp.asarray(
            get("talker.text_projection.linear_fc1.bias"), dtype),
        "proj_fc2_w": jnp.asarray(
            get("talker.text_projection.linear_fc2.weight").T, dtype),
        "proj_fc2_b": jnp.asarray(
            get("talker.text_projection.linear_fc2.bias"), dtype),
        "codec_embedding": jnp.asarray(
            get("talker.model.codec_embedding.weight"), dtype),
        "codec_head": jnp.asarray(get("talker.codec_head.weight").T, dtype),
    }


def load_code_predictor_from_hf(weights: Dict[str, np.ndarray],
                                cfg: CodePredictorConfig,
                                dtype=jnp.bfloat16) -> Params:
    get = lambda k: weights[k]
    pre = "talker.code_predictor"
    mtp_w_key = f"{pre}.small_to_mtp_projection.weight"
    mtp_b_key = f"{pre}.small_to_mtp_projection.bias"
    H = cfg.hidden_size
    mtp_w = (jnp.asarray(get(mtp_w_key).T, dtype)
             if mtp_w_key in weights else jnp.eye(H, dtype=dtype))
    mtp_b = (jnp.asarray(get(mtp_b_key), dtype)
             if mtp_b_key in weights else jnp.zeros((H,), dtype))
    return {
        "layers": _stack_layers(get, f"{pre}.model.layers", cfg.num_layers,
                                dtype),
        "final_norm": jnp.asarray(get(f"{pre}.model.norm.weight"), dtype),
        "mtp_proj_w": mtp_w,
        "mtp_proj_b": mtp_b,
        "codec_embs": jnp.asarray(np.stack(
            [get(f"{pre}.model.codec_embedding.{g}.weight")
             for g in range(cfg.num_groups)]), dtype),
        "lm_heads": jnp.asarray(np.stack(
            [get(f"{pre}.lm_head.{g}.weight").T
             for g in range(cfg.num_groups)]), dtype),
    }


# ---------------------------------------------------------------------------
# Top-level loading entry points
# ---------------------------------------------------------------------------

def load_from_hf_checkpoint(model_dir: str, cfg: TTSConfig,
                            dtype=jnp.bfloat16) -> Dict[str, Params]:
    """Load talker + code predictor from an HF Qwen3-TTS checkpoint dir
    (model.safetensors). The vocoder lives in ``speech_tokenizer/`` with its
    own architecture; it is loaded separately when present, otherwise the
    caller falls back to native-format vocoder weights."""
    st_path = os.path.join(model_dir, "model.safetensors")
    weights = _load_safetensors(st_path)
    return {
        "talker": load_talker_from_hf(weights, cfg.talker, dtype),
        "code_predictor": load_code_predictor_from_hf(
            weights, cfg.code_predictor, dtype),
    }


def init_random_params(cfg: TTSConfig, seed: int = 0,
                       dtype=jnp.bfloat16) -> Dict[str, Params]:
    """Full random-init parameter bundle (tests, benchmarks, smoke runs).
    Vocoder is always float32 regardless of ``dtype`` (FP32-only contract)."""
    from qwen3_tts_tpu.models import code_predictor as cp
    from qwen3_tts_tpu.models import talker as tk
    from qwen3_tts_tpu.models import vocoder as voc

    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    # jit each init so it compiles to ONE program per component — on a
    # tunneled TPU every small un-jitted op pays a full compile round-trip.
    return {
        "talker": jax.jit(tk.init_talker_params,
                          static_argnums=(1, 2))(k1, cfg.talker, dtype),
        "code_predictor": jax.jit(cp.init_cp_params,
                                  static_argnums=(1, 2))(k2, cfg.code_predictor,
                                                         dtype),
        "vocoder": jax.jit(voc.init_vocoder_params,
                           static_argnums=(1,))(k3, cfg.vocoder),
    }


def load_params(
    model_dir: Optional[str],
    cfg: TTSConfig,
    dtype=jnp.bfloat16,
    seed: int = 0,
) -> Dict[str, Params]:
    """Resolve weights: HF checkpoint dir -> native npz -> random init.

    - ``model_dir`` containing ``model.safetensors``: HF path (vocoder from
      ``vocoder.npz`` native file in the same dir if present, else random).
    - ``model_dir`` containing ``params.npz``: native checkpoint.
    - ``model_dir is None``: random init.
    """
    if model_dir is None:
        return init_random_params(cfg, seed, dtype)
    native = os.path.join(model_dir, "params.npz")
    if os.path.exists(native):
        return load_pytree_npz(native)
    params = load_from_hf_checkpoint(model_dir, cfg, dtype)
    voc_native = os.path.join(model_dir, "vocoder.npz")
    if os.path.exists(voc_native):
        params["vocoder"] = load_pytree_npz(voc_native, jnp.float32)
    else:
        from qwen3_tts_tpu.models import vocoder as voc
        params["vocoder"] = voc.init_vocoder_params(
            jax.random.PRNGKey(seed), cfg.vocoder)
    return params
