"""Continuous batching: multi-request talker decode in one batched program.

New capability relative to the reference (batch=1 everywhere, SURVEY §2
parallelism table); this is the daemon-serving tier from BASELINE.json
config #5. Design:

- one persistent batched ``GenState`` with B slots; the fused decode loop
  (engine/generate.py) advances ALL slots in lockstep, `decode_chunk`
  tokens per program invocation;
- between chunks the scheduler admits queued requests into free slots
  (batch-1 prefill, then a jitted slot-insert that splices the new KV /
  hidden / bookkeeping into the batched state) and harvests finished
  slots (EOS or per-slot token budget — the loop enforces per-slot
  bounds, so slots recycle indefinitely);
- finished requests run the chunked vocoder and resolve their futures.

On a dp x tp mesh the same state/batch is sharded with
parallel/mesh.gen_state_spec — the scheduler code is mesh-agnostic.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.config import (
    SAMPLES_PER_TOKEN,
    VOC_CHUNK_SIZE,
    VOC_OVERLAP,
    TTSConfig,
)
from qwen3_tts_tpu.engine import generate as gen
from qwen3_tts_tpu.models import talker as tk
from qwen3_tts_tpu.models import transformer as tfm
from qwen3_tts_tpu.models import vocoder as voc


class _Request:
    def __init__(self, text_ids, n_text, seed):
        self.text_ids = text_ids
        self.n_text = n_text
        self.seed = seed
        self.future: Future = Future()


def _empty_state(cfg: TTSConfig, batch: int, dtype) -> gen.GenState:
    geo = tfm.geometry_of(cfg.talker)
    W = cfg.sampling.repetition_window
    return gen.GenState(
        kv=tfm.init_kv_cache(geo, batch, cfg.talker.max_seq_len, dtype=dtype),
        pos=jnp.zeros((batch,), jnp.int32),
        hidden=jnp.zeros((batch, cfg.talker.hidden_size), dtype),
        ring=jnp.full((batch, W), -1, jnp.int32),
        n_codes=jnp.zeros((batch,), jnp.int32),
        done=jnp.ones((batch,), jnp.bool_),   # all slots free
        codes=jnp.zeros((batch, cfg.max_tokens, 16), jnp.int32),
        n_text=jnp.zeros((batch,), jnp.int32),
        step=jnp.int32(0),
        key=gen.batch_keys(jax.random.PRNGKey(0), batch),
    )


def _insert_slot(state: gen.GenState, slot: jax.Array,
                 sub: gen.GenState) -> gen.GenState:
    """Splice a batch-1 post-prefill state into ``slot`` of the batch.

    The spliced request's PER-ELEMENT PRNG key comes along, so the seed
    passed to submit() fully determines the request's samples — identical
    to a solo batch-1 run with the same key (round-1 advisor finding)."""
    return gen.GenState(
        kv=state.kv.at[:, :, slot].set(sub.kv[:, :, 0]),
        pos=state.pos.at[slot].set(sub.pos[0]),
        hidden=state.hidden.at[slot].set(sub.hidden[0]),
        ring=state.ring.at[slot].set(sub.ring[0]),
        n_codes=state.n_codes.at[slot].set(0),
        done=state.done.at[slot].set(False),
        codes=state.codes.at[slot].set(0),
        n_text=state.n_text.at[slot].set(sub.n_text[0]),
        step=state.step,
        key=state.key.at[slot].set(sub.key[0]),
    )


class ContinuousBatcher:
    """Fixed-slot continuous batching scheduler over the fused decode loop."""

    def __init__(self, cfg: TTSConfig, params: Dict, batch_size: int = 4,
                 decode_chunk: int = 16, dtype=jnp.bfloat16, mesh=None,
                 quantize_talker: bool = False,
                 quantize_cp: bool = True):
        """``mesh``: optional jax.sharding.Mesh (dp x tp). When given, the
        parameters are tensor-sharded and the batched decode state is
        batch-sharded over dp / kv-head-sharded over tp
        (parallel/mesh.py) — the v5e-4 serving configuration. The
        scheduler logic itself is mesh-agnostic.

        ``quantize_talker``: weight-only int8 for the TALKER only.
        Measured SLOWER than bf16 at batch 4 (8.1 vs 17.7 audio-s/s —
        batching amortizes weight streaming so int8 only adds overhead);
        kept as an experimentation knob, off by default.

        ``quantize_cp`` (default on): int8 code predictor, which routes
        the 14-step AR loop through the VMEM-resident Pallas kernel for
        batch <= 8 on a single chip (ops/pallas/cp_decode.py) instead of
        re-streaming the CP layer stack 14x per token. On a mesh the int8
        CP runs the sharded scan path (QTensor sharding specs in
        parallel/mesh.adapt_spec_to_params). ``quantize_talker`` stays
        single-chip: its fused qkv/gateup int8 layout has no mesh specs
        because bf16 is measured faster at serving batch sizes anyway."""
        self.cfg = cfg
        if quantize_talker and mesh is None:
            from qwen3_tts_tpu.ops import quant as quant_ops
            if "qkv_proj" not in params["talker"]["layers"]:
                params = {**params,
                          "talker": quant_ops.quantize_talker(
                              params["talker"])}
        if quantize_cp and batch_size <= 8:
            from qwen3_tts_tpu.ops import quant as quant_ops
            from qwen3_tts_tpu.ops.quant import QTensor
            if not isinstance(params["code_predictor"]["lm_heads"],
                              QTensor):
                params = {**params,
                          "code_predictor":
                              quant_ops.quantize_code_predictor(
                                  params["code_predictor"])}
        self.mesh = mesh
        if mesh is not None:
            from qwen3_tts_tpu.parallel import mesh as pmesh
            core = {k: params[k] for k in ("talker", "code_predictor")
                    if k in params}
            params = {**params, **pmesh.shard_params(mesh, core)}
            self._state_shardings = jax.tree.map(
                lambda sp: jax.sharding.NamedSharding(mesh, sp),
                pmesh.gen_state_spec(cfg),
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
        else:
            self._state_shardings = None
        self.params = params
        self.batch_size = batch_size
        self.decode_chunk = decode_chunk
        self.dtype = dtype

        tp = params["talker"]
        self._state = _empty_state(cfg, batch_size, dtype)
        if self._state_shardings is not None:
            self._state = jax.device_put(self._state, self._state_shardings)
        self._slot_req: List[Optional[_Request]] = [None] * batch_size
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

        self._prefill_one = jax.jit(
            lambda tp, ids, n_text, key: gen.init_state(
                tp,
                tk.build_prefix(tp, ids, n_text)[0][None].astype(
                    tp["codec_embedding"].dtype),
                tk.build_prefix(tp, ids, n_text)[1][None],
                n_text[None], key, cfg))
        self._insert = jax.jit(_insert_slot)

        def _run_fn(tp, cpp, s):
            if self._state_shardings is not None:
                s = jax.lax.with_sharding_constraint(s, self._state_shardings)
            return gen.run_steps(tp, cpp, s, cfg, jnp.int32(decode_chunk))

        self._run = jax.jit(_run_fn)
        self._voc = jax.jit(
            lambda vp, codes: voc.decode(vp, codes, cfg.vocoder))

    # -- public API ---------------------------------------------------------

    def submit(self, text_ids: np.ndarray, n_text: int,
               seed: int = 0) -> Future:
        """Queue a request; the Future resolves to
        (codes np[T,16], audio float32 np)."""
        req = _Request(jnp.asarray(text_ids, jnp.int32), jnp.int32(n_text),
                       seed)
        self._queue.put(req)
        return req.future

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)

    # -- scheduler ----------------------------------------------------------

    def _free_slots(self, done: np.ndarray) -> List[int]:
        return [i for i in range(self.batch_size)
                if done[i] and self._slot_req[i] is None]

    def _admit(self) -> int:
        done = np.asarray(jax.device_get(self._state.done))
        admitted = 0
        for slot in self._free_slots(done):
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            sub = self._prefill_one(self.params["talker"], req.text_ids,
                                    req.n_text,
                                    jax.random.PRNGKey(req.seed))
            self._state = self._insert(self._state, jnp.int32(slot), sub)
            self._slot_req[slot] = req
            admitted += 1
        return admitted

    def _harvest(self) -> int:
        done = np.asarray(jax.device_get(self._state.done))
        n_codes = np.asarray(jax.device_get(self._state.n_codes))
        finished = 0
        for slot in range(self.batch_size):
            req = self._slot_req[slot]
            if req is None or not done[slot]:
                continue
            n = int(n_codes[slot])
            codes = np.asarray(
                jax.device_get(self._state.codes[slot]))[:n]
            try:
                if n > 0:
                    audio = voc.synthesize_chunked(
                        lambda ch: self._voc(self.params["vocoder"],
                                             jnp.asarray(ch)),
                        codes, VOC_CHUNK_SIZE, VOC_OVERLAP)
                else:
                    audio = np.zeros((0,), np.float32)
                req.future.set_result((codes, audio))
            except Exception as e:
                req.future.set_exception(e)
            self._slot_req[slot] = None
            finished += 1
        return finished

    def step(self) -> bool:
        """One scheduler iteration. Returns True if any work happened."""
        admitted = self._admit()
        busy = any(r is not None for r in self._slot_req)
        if busy:
            self._state = self._run(self.params["talker"],
                                    self.params["code_predictor"],
                                    self._state)
            self._harvest()
            return True
        return admitted > 0

    def _loop(self) -> None:
        while not self._stop.is_set():
            if not self.step():
                time.sleep(0.002)
