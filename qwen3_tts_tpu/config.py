"""Model/geometry configuration for the TPU-native Qwen3-TTS framework.

The geometry reproduces the reference deployment of
Qwen3-TTS-12Hz-0.6B-Base (see /root/reference):

- Talker: 28-layer Qwen3ForCausalLM geometry
  (reference scripts/extract_talker_as_qwen3.py:89-110).
- Code predictor: 5-layer Qwen3-style transformer with 15 per-group
  codec embeddings + lm_heads of [2048, 1024]
  (reference scripts/export_code_predictor_weights.py:49-74).
- Vocoder: decoder of the Qwen3-TTS speech tokenizer v2 — 16 codebooks,
  1920x total upsampling to 24 kHz, Snake activations, SineGen harmonic
  source (reference scripts/export_vocoder_traced.py:74-80, README.md:56-64).

Everything is a frozen dataclass so configs are hashable and can be used
as static args to jit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class TalkerConfig:
    """Qwen3 talker LLM geometry (reference extract_talker_as_qwen3.py:89-110)."""

    num_layers: int = 28
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    # Embedding surface (reference scripts/extract_embeddings.py:47-70)
    text_vocab_size: int = 151936
    text_embed_dim: int = 2048
    codec_vocab_size: int = 3072
    max_seq_len: int = 512  # reference n_ctx=512 (llamacpp_talker_server.py:104)
    attention_impl: str = "xla"  # "xla" | "pallas" fused decode attention

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


@dataclasses.dataclass(frozen=True)
class CodePredictorConfig:
    """5-layer code-predictor transformer
    (reference export_code_predictor_weights.py:49-74,
    export_code_predictor_onnx.py:30-46)."""

    num_layers: int = 5
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    num_groups: int = 15          # groups 1..15 predicted per talker token
    group_vocab_size: int = 2048  # per-group codec vocab
    # seq len inside one CP call: 2 prefill + 14 decode = 16
    max_seq_len: int = 16
    attention_impl: str = "xla"

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    """FP32 codec-decoder (vocoder) geometry.

    The reference traces ``Qwen3TTSTokenizerV2Model.decoder``
    (export_vocoder_traced.py:74-80): input [1, T, 16] int64 codes,
    output 24 kHz audio, 1920 samples per token, Snake activations,
    SineGen harmonic source, dilated Conv1D stacks (dilation up to 9).
    Quantization is documented as destructive (README.md:56-64), so the
    whole module is pinned to float32.
    """

    num_codebooks: int = 16
    codebook_size: int = 2048
    embed_dim: int = 512
    # Upsample factors multiply to 1920 (= SAMPLES_PER_TOKEN at 24 kHz / 12.5Hz)
    upsample_rates: Tuple[int, ...] = (8, 6, 5, 4, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 12, 10, 8, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 9), (1, 3, 9), (1, 3, 9))
    # SineGen harmonic source (NSF-style)
    num_harmonics: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 10.0
    sample_rate: int = 24000

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Speech-tokenizer *encoder* (voice-cloning prep; reference
    scripts/encode_reference_audio.py:60-117). Mirror of the decoder:
    strided Conv1D downsampling by 1920x, then 16-way grouped VQ."""

    num_codebooks: int = 16
    codebook_size: int = 2048
    embed_dim: int = 512
    downsample_rates: Tuple[int, ...] = (2, 4, 5, 6, 8)
    kernel_sizes: Tuple[int, ...] = (4, 8, 10, 12, 16)
    sample_rate: int = 24000


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """code_0 sampling policy (reference llamacpp_talker_server.py:163-206)
    and CP group sampling (code_predictor_server.py:87-92)."""

    temperature: float = 0.8
    top_k: int = 50
    top_p: float = 0.95
    repetition_penalty: float = 1.2
    repetition_window: int = 30
    eos_boost_start: float = 0.8   # progress threshold
    eos_boost_ramp: float = 0.7    # ramp width
    eos_boost_max: float = 15.0
    eos_force_progress: float = 2.0
    expected_tokens_per_text_token: int = 3
    # CP sampling
    cp_temperature: float = 0.1
    cp_top_k: int = 50


# Special codec token ids (reference llamacpp_talker_server.py:44-49)
CODEC_PAD_ID = 2148
CODEC_BOS_ID = 2149
CODEC_EOS_ID = 2150
CODEC_NOTHINK_ID = 2155
CODEC_THINK_BOS_ID = 2156
CODEC_THINK_EOS_ID = 2157
NUM_AUDIO_CODES = 2048  # valid audio codes are 0..2047

# Special text-vocab ids (reference llamacpp_talker_server.py:52-55, 132)
TTS_PAD_TOKEN_ID = 151671
TTS_BOS_TOKEN_ID = 151672
TTS_EOS_TOKEN_ID = 151673
IM_START_TOKEN_ID = 151644
ASSISTANT_TOKEN_ID = 77091
NEWLINE_TOKEN_ID = 198

# Audio constants (reference tts_client.py:29-31)
SAMPLE_RATE = 24000
SAMPLES_PER_TOKEN = 1920
VOC_CHUNK_SIZE = 64
VOC_OVERLAP = 16  # vocoder_server.py:84

# Supported languages (reference README.md:143-145). The reference accepts
# the field but it has no numerical effect (llamacpp_talker_server.py:121);
# we preserve the same API surface.
SUPPORTED_LANGUAGES = (
    "chinese", "english", "german", "russian", "french", "japanese", "korean",
)


@dataclasses.dataclass(frozen=True)
class TTSConfig:
    """Top-level bundle for the whole pipeline."""

    talker: TalkerConfig = TalkerConfig()
    code_predictor: CodePredictorConfig = CodePredictorConfig()
    vocoder: VocoderConfig = VocoderConfig()
    encoder: EncoderConfig = EncoderConfig()
    sampling: SamplingConfig = SamplingConfig()
    max_tokens: int = 200  # reference llamacpp_talker_server.py:65


def tiny_tts_config(max_tokens: int = 16) -> TTSConfig:
    """A miniature geometry for CPU tests: same structure, small dims."""
    talker = TalkerConfig(
        num_layers=2, hidden_size=64, intermediate_size=128,
        num_heads=4, num_kv_heads=2, head_dim=16,
        text_vocab_size=151936, text_embed_dim=32,
        codec_vocab_size=3072, max_seq_len=128,
    )
    cp = CodePredictorConfig(
        num_layers=2, hidden_size=64, intermediate_size=128,
        num_heads=4, num_kv_heads=2, head_dim=16,
        num_groups=15, group_vocab_size=2048,
    )
    voc = VocoderConfig(
        num_codebooks=16, codebook_size=2048, embed_dim=32,
        upsample_rates=(8, 6, 5, 4, 2),
        upsample_kernel_sizes=(16, 12, 10, 8, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3, 9),),
        num_harmonics=4,
    )
    enc = EncoderConfig(
        num_codebooks=16, codebook_size=2048, embed_dim=32,
        downsample_rates=(2, 4, 5, 6, 8),
        kernel_sizes=(4, 8, 10, 12, 16),
    )
    return TTSConfig(talker=talker, code_predictor=cp, vocoder=voc,
                     encoder=enc, max_tokens=max_tokens)
