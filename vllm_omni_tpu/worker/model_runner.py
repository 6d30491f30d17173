"""AR model runner: bucketed jit prefill/decode steps over paged KV.

Reference parity: worker/gpu_ar_model_runner.py:65 (GPUARModelRunner) and
gpu_model_runner.py:41. TPU-first design:

- Every scheduler step maps to exactly one jitted program chosen from a
  small set of static *buckets* (decode batch size, prefill rows × chunk
  tokens, page-table width). Buckets replace CUDA-graph capture
  (SURVEY.md §7 design stance); XLA caches one executable per bucket.
- The paged KV cache is a per-layer list of (K, V) HBM arrays
  [Hkv, num_pages, page_size, D] *donated* through every step, so XLA
  updates pages in place — no copy of the cache per token.
- Sampling is fused into the step program (ops/sampler.py); only the
  sampled int32 ids (and optionally last-layer hidden states for
  next-stage handoff) come back to the host.
- With a mesh, params/KV carry NamedShardings (TP on the heads axis) and
  the same step functions run SPMD — XLA inserts the collectives.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.request import Request
from vllm_omni_tpu.core.scheduler import ScheduledPrefill
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.decoder import (DecoderConfig, compute_logits,
                                          decoder_forward, param_shardings)
from vllm_omni_tpu.ops import sampler as sampler_ops
from vllm_omni_tpu.ops.attention import (mha_xla,
                                         paged_attention_decode_pallas,
                                         paged_attention_decode_xla,
                                         paged_attention_prefill_pallas,
                                         paged_attention_prefill_xla,
                                         quantize_kv, write_kv_pages)
from vllm_omni_tpu.platforms import current_platform
from vllm_omni_tpu.utils import cdiv, pick_bucket

logger = init_logger(__name__)

PREFILL_ROW_BUCKETS = (1, 2, 4, 8, 16)


@dataclass
class StepResult:
    """Host-side result of one prefill/decode step."""

    req_ids: list[str]
    token_ids: list[int]  # sampled token per row (prefill: only valid for
    # rows whose prompt completed this step)
    logprobs: list[float]
    hidden_states: dict[str, Any] = field(default_factory=dict)
    # in-loop conditioner outputs: req_id → [G] codec codes produced
    # alongside this step's token (see set_step_conditioner)
    codes: dict[str, Any] = field(default_factory=dict)


class ModelRunner:
    def __init__(self, config: EngineConfig, decoder_cfg: DecoderConfig,
                 params: dict, mesh: Optional[Mesh] = None,
                 num_pages: Optional[int] = None) -> None:
        self.config = config
        self.cfg = decoder_cfg
        self.mesh = mesh
        self.platform = current_platform()
        self.dtype = jnp.bfloat16 if config.model.dtype == "bfloat16" \
            else jnp.dtype(config.model.dtype)
        self.page_size = config.cache.page_size
        self.num_pages = num_pages or config.cache.num_pages or \
            self._derive_num_pages()
        self.max_pages_per_seq = cdiv(config.model.max_model_len,
                                      self.page_size)
        kv_dtype = config.model.kv_cache_dtype
        if kv_dtype == "auto":
            kv_dtype = config.model.dtype
        self.kv_quant = kv_dtype if kv_dtype in ("fp8", "int8") else "none"
        self.kv_dtype = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8,
                         "bfloat16": jnp.bfloat16,
                         "float32": jnp.float32}[kv_dtype]
        self.scale = decoder_cfg.head_dim ** -0.5

        self.pp = mesh.shape.get("pp", 1) if mesh is not None else 1
        if self.pp > 1:
            # GPipe AR pipeline parallelism (decoder_forward_pp): layer
            # groups + their KV pages shard over "pp"; embed/lm_head
            # stay replicated. v1 constraints below.
            if mesh.shape.get("tp", 1) > 1:
                raise ValueError("pipeline_parallel with tp>1 lands "
                                 "later; use pp-only meshes")
            if decoder_cfg.is_moe:
                raise ValueError("pipeline_parallel v1 is dense-only")
            if decoder_cfg.mrope_section is not None:
                raise ValueError("pipeline_parallel v1 has no M-RoPE")
            from vllm_omni_tpu.models.decoder import stack_layer_params

            params = dict(params)
            params["layers_stacked"] = stack_layer_params(
                params.pop("layers"))
            specs = {k: jax.tree.map(
                lambda _: P("pp") if k == "layers_stacked" else P(), v)
                for k, v in params.items()}
            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                params, specs)
        elif mesh is not None:
            specs = param_shardings(
                params, expert_parallel=config.parallel.expert_parallel)
            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                params, specs, is_leaf=lambda x: x is None)
        self.params = params
        self.kv_pages = self._alloc_kv()
        # per-head KV dequant scales [num_layers, hkv] x (K, V), set by
        # _calibrate_kv_scales on the first real prefill (amax of real
        # K/V per head x1.5 headroom; reference: vLLM k_scale/v_scale,
        # checkpoint-calibrated). None = legacy fixed scales. numpy on
        # purpose: read at trace time, baked as tiny jit constants.
        self.kv_scales: Optional[tuple] = None
        self._fn_cache: dict[tuple, Any] = {}
        # shard_map-wrapped attention ops per (decode, with_scales)
        self._meshed_attn_cache: dict[tuple, Any] = {}
        # in-loop per-step conditioning (dual-AR families): traced
        # inside the decode scan — see set_step_conditioner
        self.step_conditioner: Optional[dict] = None
        # device-resident decode-chain inputs (see execute_decode_multi)
        self._decode_cache: Optional[dict] = None
        self.decode_cache_hits = 0
        self.decode_cache_misses = 0
        # device forward passes (weight-streaming passes) — the unit
        # device time scales with; spec decode optimizes this
        self.forward_passes = 0

    # -- memory -------------------------------------------------------------
    def _page_bytes(self) -> int:
        itemsize = jnp.dtype(self.kv_dtype).itemsize if hasattr(
            self, "kv_dtype") else 2
        return (self.cfg.num_layers * 2 * self.cfg.num_kv_heads *
                self.page_size * self.cfg.head_dim * itemsize)

    def _derive_num_pages(self) -> int:
        """Size the KV pool from free HBM (reference: gpu_memory_utils /
        gpu_memory_utilization in stage YAMLs)."""
        dev = jax.devices()[0]
        try:
            stats = dev.memory_stats()
            total = stats["bytes_limit"] - stats["bytes_in_use"]
        except Exception:
            total = 4 << 30  # CPU tier: pretend 4 GiB
        budget = int(total * self.config.cache.memory_fraction)
        # rough param bytes already resident; budget is free memory so ok
        per_page = (self.cfg.num_layers * 2 * self.cfg.num_kv_heads *
                    self.page_size * self.cfg.head_dim * 2)
        n = max(16, budget // per_page)
        return int(min(n, 65536))

    def _alloc_kv(self) -> list:
        from vllm_omni_tpu.ops.attention import kv_physical_shape

        shape = kv_physical_shape(self.cfg.num_kv_heads, self.num_pages,
                                  self.page_size, self.cfg.head_dim,
                                  self.kv_dtype)
        if self.pp > 1:
            # stacked caches [L, ...] sharded over "pp" — each rank
            # stores only its layer group's pages
            sh = NamedSharding(self.mesh, P("pp"))
            full = (self.cfg.num_layers,) + shape
            return [jax.device_put(jnp.zeros(full, self.kv_dtype), sh),
                    jax.device_put(jnp.zeros(full, self.kv_dtype), sh)]
        sharding = None
        if self.mesh is not None:
            if self.mesh.shape.get("tp", 1) > self.cfg.num_kv_heads:
                raise ValueError("tp > num_kv_heads unsupported")
            # page-major cache: heads (the TP axis) are dim 1
            sharding = NamedSharding(self.mesh, P(None, "tp", None, None))

        def zeros():
            z = jnp.zeros(shape, self.kv_dtype)
            return jax.device_put(z, sharding) if sharding is not None else z

        return [(zeros(), zeros()) for _ in range(self.cfg.num_layers)]

    @property
    def kv_cache_bytes(self) -> int:
        return (self.num_pages * self.cfg.num_layers * 2 *
                self.cfg.num_kv_heads * self.page_size * self.cfg.head_dim *
                jnp.dtype(self.kv_dtype).itemsize)

    # -- traced step bodies -------------------------------------------------
    def _use_pallas_decode(self) -> bool:
        # int8 KV dequants in-kernel; the physical page layout must be
        # 128-lane aligned — d % 128 == 0 directly, d ∈ {32, 64} via the
        # lane-packed layout (kv_physical_shape; needs a page_size of
        # at least min_page_size_for_pallas). Meshed topologies reach
        # the same kernels through _meshed_attn (shard_map over "tp").
        return self.platform.supports_pallas and \
            self.kv_pages[0][0].shape[-1] % 128 == 0

    def _meshed_attn(self, decode: bool) -> Any:
        """shard_map-wrapped (quantize → page write → paged attention)
        over the stage mesh: q heads and KV heads shard on "tp"
        (kv sharding P(None, "tp", ...) — _alloc_kv), block tables /
        context lens replicate. Per shard every op sees an unsharded
        local cache, so the in-place Pallas page writer and the
        DMA-pipelined decode kernel run unchanged in EVERY topology —
        under plain GSPMD a pallas_call would force a gather of the
        sharded cache (the round-3 reason tp>1 fell back to XLA
        attention). The per-head dequant scales ride as explicit args
        sharded on "tp" (a closed-over constant would arrive
        full-length inside the shard)."""
        with_scales = self.kv_scales is not None
        key = (decode, with_scales)
        fn = self._meshed_attn_cache.get(key)
        if fn is not None:
            return fn
        use_pallas_attn = self._use_pallas_decode()
        scale = self.scale
        kv_quant = self.kv_quant

        def local(q, kp, vp, k_new, v_new, slots, bt, kv_lens,
                  *rest):
            if decode:
                sc = rest
            else:
                q_start, sc = rest[0], rest[1:]
            k_sc, v_sc = sc if sc else (None, None)
            kq, vq = quantize_kv(k_new, v_new, kv_quant, k_sc, v_sc)
            kp, vp = write_kv_pages(kp, vp, kq, vq, slots,
                                    pallas_ok=True)
            if decode:
                if use_pallas_attn:
                    o = paged_attention_decode_pallas(
                        q, kp, vp, bt, kv_lens, scale=scale,
                        k_scale=k_sc, v_scale=v_sc)
                else:
                    o = paged_attention_decode_xla(
                        q, kp, vp, bt, kv_lens, scale,
                        k_scale=k_sc, v_scale=v_sc)
            elif use_pallas_attn:
                o = paged_attention_prefill_pallas(
                    q, kp, vp, bt, q_start, kv_lens, scale=scale,
                    k_scale=k_sc, v_scale=v_sc)
            else:
                o = paged_attention_prefill_xla(
                    q, kp, vp, bt, q_start, kv_lens, scale,
                    k_scale=k_sc, v_scale=v_sc)
            return o, kp, vp

        kv_spec = P(None, "tp", None, None)
        q_spec = P(None, "tp", None) if decode \
            else P(None, None, "tp", None)
        new_spec = P(None, "tp", None)
        in_specs = [q_spec, kv_spec, kv_spec, new_spec, new_spec,
                    P(), P(), P()]
        if not decode:
            in_specs += [P()]
        if with_scales:
            in_specs += [P("tp"), P("tp")]
        fn = jax.shard_map(local, mesh=self.mesh,
                           in_specs=tuple(in_specs),
                           out_specs=(q_spec, kv_spec, kv_spec),
                           check_vma=False)
        self._meshed_attn_cache[key] = fn
        return fn

    def _forward(self, params, kv_pages, token_ids, positions, block_tables,
                 q_start, kv_lens, slot_ids, *, decode: bool,
                 input_embeds=None):
        """Shared traced forward. Mutates a local copy of kv_pages via
        closure; returns (hidden [B,T,H], new_kv)."""
        if self.pp > 1:
            from vllm_omni_tpu.models.decoder import decoder_forward_pp

            kv_k, kv_v = kv_pages
            hidden, kv_k2, kv_v2 = decoder_forward_pp(
                params, self.cfg, token_ids, positions, self.mesh,
                kv_k, kv_v, slot_ids, block_tables, q_start, kv_lens,
                self.scale, kv_quant=self.kv_quant, decode=decode,
                input_embeds=input_embeds)
            return hidden, [kv_k2, kv_v2]
        kv_list = list(kv_pages)
        b, t = token_ids.shape[0], token_ids.shape[-1]

        def attn_apply(i, q, k, v):
            kp, vp = kv_list[i]
            k_sc = v_sc = None
            if self.kv_scales is not None:
                k_sc = jnp.asarray(self.kv_scales[0][i])
                v_sc = jnp.asarray(self.kv_scales[1][i])
            k_flat = k.reshape(b * t, self.cfg.num_kv_heads,
                               self.cfg.head_dim)
            v_flat = v.reshape(b * t, self.cfg.num_kv_heads,
                               self.cfg.head_dim)
            if self.mesh is not None:
                q_in = q.reshape(b, self.cfg.num_heads,
                                 self.cfg.head_dim) if decode else q
                args = [q_in, kp, vp, k_flat, v_flat,
                        slot_ids.reshape(-1), block_tables, kv_lens]
                if not decode:
                    args += [q_start]
                if k_sc is not None:
                    args += [k_sc, v_sc]
                o, kp, vp = self._meshed_attn(decode)(*args)
                kv_list[i] = (kp, vp)
                if decode:
                    return o.reshape(b, 1, self.cfg.num_heads,
                                     self.cfg.head_dim)
                return o
            kq, vq = quantize_kv(k_flat, v_flat, self.kv_quant, k_sc, v_sc)
            kp, vp = write_kv_pages(kp, vp, kq, vq, slot_ids.reshape(-1),
                                    pallas_ok=True)
            kv_list[i] = (kp, vp)
            if decode:
                q2 = q.reshape(b, self.cfg.num_heads, self.cfg.head_dim)
                if self._use_pallas_decode():
                    o = paged_attention_decode_pallas(
                        q2, kp, vp, block_tables, kv_lens, scale=self.scale,
                        k_scale=k_sc, v_scale=v_sc)
                else:
                    o = paged_attention_decode_xla(
                        q2, kp, vp, block_tables, kv_lens, self.scale,
                        k_scale=k_sc, v_scale=v_sc)
                return o.reshape(b, 1, self.cfg.num_heads, self.cfg.head_dim)
            if self._use_pallas_decode():  # same constraints apply
                return paged_attention_prefill_pallas(
                    q, kp, vp, block_tables, q_start, kv_lens,
                    scale=self.scale, k_scale=k_sc, v_scale=v_sc)
            return paged_attention_prefill_xla(
                q, kp, vp, block_tables, q_start, kv_lens, self.scale,
                k_scale=k_sc, v_scale=v_sc)

        hidden = decoder_forward(params, self.cfg, token_ids, positions,
                                 attn_apply, input_embeds=input_embeds)
        return hidden, kv_list

    @staticmethod
    def _counts_from(tokens: jnp.ndarray, b: int, v: int) -> jnp.ndarray:
        """[B, W] token buffer (-1 = pad) → [B, V] int32 occurrence
        counts (pads dropped via out-of-bounds scatter)."""
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], tokens.shape)
        return jnp.zeros((b, v), jnp.int32).at[
            rows.reshape(-1), tokens.reshape(-1)].add(
            (tokens >= 0).reshape(-1).astype(jnp.int32), mode="drop")

    def _prefill_body(self, params, kv_pages, token_ids, positions,
                      block_tables, q_start, kv_lens, slot_ids, last_idx,
                      sampling, step_ctr, embeds, embeds_mask, logit_bias,
                      prompt_tokens, out_tokens,
                      *, return_hidden: bool, with_embeds: bool,
                      use_bias: bool = False, use_penalties: bool = False):
        if with_embeds:
            # positions flagged in embeds_mask [B, T] use the provided
            # embeddings instead of the token embedding lookup: whole-row
            # for embeddings-as-prompt handoff (reference OmniEmbedsPrompt
            # inputs/data.py:85), per-token for multimodal placeholder
            # fusion (audio/image features spliced into the text prompt)
            looked_up = jnp.take(params["embed"], token_ids, axis=0)
            mixed = jnp.where(embeds_mask[:, :, None],
                              embeds.astype(looked_up.dtype), looked_up)
            hidden, new_kv = self._forward(
                params, kv_pages, token_ids, positions, block_tables,
                q_start, kv_lens, slot_ids, decode=False,
                input_embeds=mixed)
        else:
            hidden, new_kv = self._forward(params, kv_pages, token_ids,
                                           positions, block_tables, q_start,
                                           kv_lens, slot_ids, decode=False)
        b = token_ids.shape[0]
        last_h = hidden[jnp.arange(b), last_idx]  # [B, H]
        logits = compute_logits(params, self.cfg, last_h)
        if use_bias:
            logits = logits + logit_bias
        counts = prompt_counts = None
        if use_penalties:
            # the token sampled at prefill end honors penalties too
            # (vLLM semantics — repetition spans the prompt)
            v = logits.shape[-1]
            counts = self._counts_from(out_tokens, b, v)
            prompt_counts = self._counts_from(prompt_tokens, b, v)
        ids, lp = sampler_ops.sample(logits, sampling, step_ctr, counts,
                                     prompt_counts=prompt_counts)
        out = (ids, lp, new_kv)
        if return_hidden:
            out = out + (hidden,)
        return out

    def _decode_body(self, params, kv_pages, token_ids, positions,
                     block_tables, kv_lens, slot_ids, sampling, step_ctr,
                     out_tokens, prompt_tokens, *, use_penalties: bool,
                     return_hidden: bool):
        hidden, new_kv = self._forward(
            params, kv_pages, token_ids[:, None], positions[:, None],
            block_tables, None, kv_lens, slot_ids[:, None], decode=True)
        last_h = hidden[:, 0]  # [B, H]
        logits = compute_logits(params, self.cfg, last_h)
        counts = prompt_counts = None
        if use_penalties:
            b, v = logits.shape
            counts = self._counts_from(out_tokens, b, v)
            prompt_counts = self._counts_from(prompt_tokens, b, v)
        ids, lp = sampler_ops.sample(logits, sampling, step_ctr, counts,
                                     prompt_counts=prompt_counts)
        out = (ids, lp, new_kv)
        if return_hidden:
            out = out + (last_h,)
        return out

    def set_step_conditioner(self, fn, num_groups: int,
                             aux_builder=None) -> None:
        """Install an in-loop per-step conditioner for dual-AR families
        (reference talker_mtp fast path, fish_speech_slow_ar.py:646 /
        qwen3_tts talker mtp_inputs): inside the decode scan, step t's
        input embedding is rewritten by ``fn(aux, tok, emb,
        prev_hidden, ctr) → (new_emb [B, H], codes [B, G])`` where
        prev_hidden is the hidden state that SAMPLED tok
        (hidden_{t-1}). The codes ride out of the chain as per-step
        outputs (StepResult.codes) — this is what lets residual
        codebooks stream per frame AND condition the slow AR exactly
        like the reference. fn must be traceable (it runs inside the
        jitted chain). aux_builder(reqs, b) → dict of np arrays with a
        leading batch dim: per-request conditioning data (e.g. a
        precomputed text-hidden queue) passed to fn as traced args;
        None → fn is called without the aux argument."""
        self.step_conditioner = {"fn": fn, "groups": num_groups,
                                 "aux_builder": aux_builder}
        self._fn_cache = {k: v for k, v in self._fn_cache.items()
                          if k[0] != "decode_multi"}
        self._decode_cache = None

    def _decode_multi_body(self, params, kv_pages, state, bt, f_sampling,
                           i_sampling, out_tokens, logit_bias,
                           prompt_tokens, prev_hidden=None,
                           cond_aux=None, *, k: int,
                           use_penalties: bool, return_hidden: bool,
                           greedy_only: bool, use_bias: bool = False,
                           use_cond: bool = False):
        """K chained decode steps in one program — the TPU serving hot
        loop. Sampled tokens feed the next step on device; the host syncs
        once per K tokens (amortizes dispatch/transfer latency K×, the
        moral equivalent of the reference's CUDA-graph decode capture).

        state: int32 [3, B] = (last token, its position, step counter).
        kv_len is position+1; KV slots are computed from bt on device.
        """
        b = state.shape[1]
        mrope = self.cfg.mrope_section is not None
        sampling = sampler_ops.unpack_sampling(f_sampling, i_sampling)
        rows = jnp.arange(b)
        counts0 = prompt_counts = None
        if use_penalties:
            v = self.cfg.vocab_size
            counts0 = self._counts_from(out_tokens, b, v)
            # prompt occurrences are fixed for the whole chain
            prompt_counts = self._counts_from(prompt_tokens, b, v)

        delta = state[3] if state.shape[0] > 3 else jnp.zeros(
            (b,), jnp.int32)

        def one_step(carry, _):
            kv, tok, pos, ctr, counts, ph = carry
            kv_lens = pos + 1
            page = bt[rows, pos // self.page_size]
            slot = page * self.page_size + pos % self.page_size
            if mrope:
                # decode: all three M-RoPE streams advance together at
                # max_prompt_pos + n (vLLM MRotaryEmbedding delta rule)
                rope_pos = jnp.broadcast_to(
                    (pos + delta)[:, None, None], (b, 3, 1))
            else:
                rope_pos = pos[:, None]
            codes = None
            input_embeds = None
            if use_cond:
                emb = jnp.take(params["embed"], tok, axis=0)
                if cond_aux is not None:
                    new_emb, codes = self.step_conditioner["fn"](
                        cond_aux, tok, emb, ph, ctr)
                else:
                    new_emb, codes = self.step_conditioner["fn"](
                        tok, emb, ph, ctr)
                input_embeds = new_emb.astype(emb.dtype)[:, None]
            hidden, kv = self._forward(
                params, kv, tok[:, None], rope_pos, bt, None, kv_lens,
                slot[:, None], decode=True, input_embeds=input_embeds)
            last_h = hidden[:, 0]
            logits = compute_logits(params, self.cfg, last_h)
            if use_bias:
                logits = logits + logit_bias  # [B, V] additive
            ids, lp = sampler_ops.sample(logits, sampling, ctr, counts,
                                         greedy_only=greedy_only,
                                         prompt_counts=prompt_counts)
            if use_penalties:
                counts = counts.at[rows, ids].add(1)
            out = (ids, lp)
            if return_hidden:
                out = out + (last_h,)
            if use_cond:
                out = out + (codes,)
            new_ph = last_h.astype(jnp.float32) if use_cond else ph
            return (kv, ids, pos + 1, ctr + 1, counts, new_ph), out

        ph0 = prev_hidden if use_cond else jnp.zeros((), jnp.float32)
        init = (list(kv_pages), state[0], state[1], state[2], counts0,
                ph0)
        (kv, tok_f, pos_f, ctr_f, _, ph_f), outs = jax.lax.scan(
            one_step, init, None, length=k)
        # next-chain state stays ON DEVICE: steady-state decode needs no
        # host→device uploads at all (the engine feeds this straight back)
        next_state = jnp.stack([tok_f, pos_f, ctr_f, delta])
        ret = list(outs[:2]) + [kv, next_state]
        if return_hidden:
            ret.append(outs[2])
        if use_cond:
            ret.append(outs[-1])  # codes [K, B, G]
            ret.append(ph_f)
        return tuple(ret)

    # -- KV quant calibration -------------------------------------------------
    def _calibrate_kv_scales(self, token_ids, positions, q_start,
                             kv_lens) -> None:
        """One extra forward over the first real prefill's inputs,
        collecting per-layer per-head amax of pre-quantization K/V →
        per-head dequant scales with 1.5x headroom (later outliers clip
        at most mildly; ppl gate: benchmarks/ppl_eval.py --kv-quant).
        Reference: vLLM kv-cache k_scale/v_scale (per-tensor, from
        ModelOpt-calibrated checkpoints); ours calibrates online and is
        per-head. Runs BEFORE any serving variant is traced — the
        scales are baked into every later jit as [hkv] constants."""
        denom = 448.0 if self.kv_quant == "fp8" else 127.0

        @jax.jit
        def calib(params, token_ids, positions, q_start, kv_lens):
            b, t = token_ids.shape
            valid = (jnp.arange(t)[None, :] <
                     (kv_lens - q_start)[:, None])  # [B, T]
            stats = []

            def attn_apply(i, q, k, v):
                m = valid[:, :, None, None]
                stats.append((
                    jnp.max(jnp.abs(k.astype(jnp.float32)) * m,
                            axis=(0, 1, 3)),
                    jnp.max(jnp.abs(v.astype(jnp.float32)) * m,
                            axis=(0, 1, 3))))
                return mha_xla(q, k, v, self.scale, causal=True)

            decoder_forward(params, self.cfg, token_ids, positions,
                            attn_apply)
            return (jnp.stack([s[0] for s in stats]),
                    jnp.stack([s[1] for s in stats]))

        k_amax, v_amax = jax.device_get(
            calib(self.params, token_ids, positions, q_start, kv_lens))
        floor = 1e-6
        self.kv_scales = (
            np.maximum(k_amax * 1.5 / denom, floor).astype(np.float32),
            np.maximum(v_amax * 1.5 / denom, floor).astype(np.float32))
        # any fn traced without scales (shouldn't exist — calibration
        # precedes the first serving trace) must not survive
        self._fn_cache.clear()
        self._decode_cache = None
        logger.info("calibrated per-head KV scales (%s): k amax %.3f, "
                    "v amax %.3f", self.kv_quant, float(k_amax.max()),
                    float(v_amax.max()))

    # -- jit cache ----------------------------------------------------------
    def _get_fn(self, kind: str, **static) -> Any:
        key = (kind, tuple(sorted(static.items())))
        fn = self._fn_cache.get(key)
        if fn is None:
            if kind == "prefill":
                body = functools.partial(
                    self._prefill_body,
                    return_hidden=static["return_hidden"],
                    with_embeds=static["with_embeds"],
                    use_bias=static.get("use_bias", False),
                    use_penalties=static.get("use_penalties", False))
                fn = jax.jit(body, donate_argnums=(1,))
            elif kind == "decode_multi":
                body = functools.partial(
                    self._decode_multi_body, k=static["k"],
                    use_penalties=static["use_penalties"],
                    return_hidden=static["return_hidden"],
                    greedy_only=static["greedy_only"],
                    use_bias=static.get("use_bias", False),
                    use_cond=static.get("use_cond", False))
                fn = jax.jit(body, donate_argnums=(1,))
            else:
                body = functools.partial(
                    self._decode_body,
                    use_penalties=static["use_penalties"],
                    return_hidden=static["return_hidden"])
                fn = jax.jit(body, donate_argnums=(1,))
            self._fn_cache[key] = fn
        return fn

    # -- KV extraction / injection (stage disaggregation) --------------------
    def _no_pp(self, what: str) -> None:
        if self.pp > 1:
            raise RuntimeError(
                f"{what} is not supported with pipeline_parallel yet "
                "(stacked pp-sharded caches need a gather-by-layer-group "
                "path)")

    def extract_kv(self, page_ids: list[int]) -> np.ndarray:
        self._no_pp("KV transfer")
        """Gather a request's KV pages off the device →
        [L, 2, Hkv, P, ps, D] (reference kv_transfer_manager.py:274
        extract side). P is padded to a power-of-2 bucket; callers slice
        by the real page count."""
        pw = self._page_bucket(len(page_ids))
        ids = np.zeros((pw,), np.int32)
        ids[:len(page_ids)] = page_ids
        key = ("kv_extract", pw)
        fn = self._fn_cache.get(key)
        if fn is None:
            def gather(kv_pages, pids):
                # page-major cache → head-major wire format (the hetero-
                # TP slicing axis stays Hkv at wire dim 2)
                per_layer = [jnp.stack([
                    jnp.swapaxes(kp[pids], 0, 1),
                    jnp.swapaxes(vp[pids], 0, 1)])
                    for kp, vp in kv_pages]
                return jnp.stack(per_layer)  # [L,2,Hkv,P,ps,D]

            fn = jax.jit(gather)
            self._fn_cache[key] = fn
        out = np.asarray(fn(self.kv_pages, ids))
        return out[:, :, :, :len(page_ids)]

    def inject_kv(self, page_ids: list[int], data: np.ndarray) -> None:
        self._no_pp("KV transfer")
        """Scatter transferred KV into this engine's pages (reference
        receive_kv_cache_for_request :968). data: [L, 2, Hkv, P, ps, D]
        with P == len(page_ids); dtype converts to this engine's KV
        storage dtype."""
        pw = self._page_bucket(len(page_ids))
        p = len(page_ids)
        padded = np.zeros(data.shape[:3] + (pw,) + data.shape[4:],
                          data.dtype)
        padded[:, :, :, :p] = data
        ids = np.zeros((pw,), np.int32)  # pad slots → null page 0
        ids[:p] = page_ids
        key = ("kv_inject", pw)
        fn = self._fn_cache.get(key)
        if fn is None:
            def scatter(kv_pages, pids, blob):
                out = []
                for i, (kp, vp) in enumerate(kv_pages):
                    kp = kp.at[pids].set(
                        jnp.swapaxes(blob[i, 0], 0, 1).astype(kp.dtype))
                    vp = vp.at[pids].set(
                        jnp.swapaxes(blob[i, 1], 0, 1).astype(vp.dtype))
                    out.append((kp, vp))
                return out

            fn = jax.jit(scatter, donate_argnums=(0,))
            self._fn_cache[key] = fn
        self.kv_pages = fn(self.kv_pages, ids, padded)
        self._decode_cache = None

    # -- speculative decoding (verify pass) ----------------------------------
    def _spec_verify_body(self, params, kv_pages, token_ids, positions,
                          block_tables, q_start, kv_lens, slot_ids):
        """Feed [last, p1..pγ] per row with causal paged attention
        (prefill path — writes their KV) and return the greedy target
        token at EVERY position [B, γ+1]."""
        hidden, new_kv = self._forward(params, kv_pages, token_ids,
                                       positions, block_tables, q_start,
                                       kv_lens, slot_ids, decode=False)
        logits = compute_logits(params, self.cfg, hidden)  # [B,T,V]
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return ids, new_kv

    def execute_spec_verify(self, reqs: list[Request],
                            proposals: list[list[int]],
                            gamma: int) -> list[list[int]]:
        """→ per request, the ACCEPTED new tokens (matched proposals +
        one bonus target; ≥1 token each). Caller pre-allocated pages for
        num_tokens + gamma + 1."""
        n = len(reqs)
        b = pick_bucket(n, self.config.scheduler.decode_bs_buckets)
        t = gamma + 1
        max_pages = max(cdiv(r.num_tokens + t, self.page_size)
                        for r in reqs)
        pw = self._page_bucket(max_pages)
        mrope = self.cfg.mrope_section is not None

        token_ids = np.zeros((b, t), np.int32)
        positions = np.zeros((b, 3, t) if mrope else (b, t), np.int32)
        slot_ids = np.zeros((b, t), np.int32)
        q_start = np.zeros((b,), np.int32)
        kv_lens = np.zeros((b,), np.int32)
        bt = np.zeros((b, pw), np.int32)
        bt[:n] = self._block_table_rows(reqs, pw)
        for i, r in enumerate(reqs):
            fed = [r.output_token_ids[-1] if r.output_token_ids else
                   (r.prompt_token_ids[-1] if r.prompt_token_ids else 0)]
            fed += list(proposals[i][:gamma])
            fed += [0] * (t - len(fed))
            token_ids[i] = fed
            pos0 = r.num_tokens - 1
            pos_row = np.arange(pos0, pos0 + t)
            if mrope:
                positions[i, :] = pos_row + r.mrope_delta
            else:
                positions[i] = pos_row
            q_start[i] = pos0
            kv_lens[i] = pos0 + t
            for j in range(t):
                p = pos0 + j
                page = r.page_ids[p // self.page_size]
                slot_ids[i, j] = page * self.page_size + \
                    p % self.page_size

        fn = self._fn_cache.get(("spec", b, t, pw))
        if fn is None:
            fn = jax.jit(self._spec_verify_body, donate_argnums=(1,))
            self._fn_cache[("spec", b, t, pw)] = fn
        ids, self.kv_pages = fn(self.params, self.kv_pages, token_ids,
                                positions, bt, q_start, kv_lens, slot_ids)
        self.forward_passes += 1
        self._decode_cache = None  # chain state invalidated by KV writes
        targets = np.asarray(ids)  # [B, t]: target for position pos0+j+1
        out: list[list[int]] = []
        for i, r in enumerate(reqs):
            prop = list(proposals[i][:gamma])
            accepted = []
            j = 0
            while j < len(prop) and prop[j] == int(targets[i, j]):
                accepted.append(prop[j])
                j += 1
            accepted.append(int(targets[i, j]))  # bonus / correction
            out.append(accepted)
        return out

    @staticmethod
    def ngram_propose(token_ids: list[int], gamma: int,
                      n: int = 2) -> list[int]:
        """Prompt-lookup proposal: find the most recent earlier
        occurrence of the trailing n-gram; propose the tokens that
        followed it."""
        if len(token_ids) < n + 1:
            return []
        key = tuple(token_ids[-n:])
        best: list[int] = []
        # most recent earlier occurrence with a FULL gamma-token follow
        # wins (a match too close to the end truncates the proposal —
        # exactly the cyclic-tail case speculation thrives on)
        for start in range(len(token_ids) - n - 1, -1, -1):
            if tuple(token_ids[start:start + n]) == key:
                follow = token_ids[start + n:start + n + gamma]
                if len(follow) >= gamma:
                    return list(follow)
                if len(follow) > len(best):
                    best = list(follow)
        return best

    # -- sleep mode / weight reload ------------------------------------------
    def sleep(self, level: int = 1) -> None:
        """Free device memory (reference: diffusion_worker.py:278-357
        sleep/wake_up with CuMem pools). level 1: weights offload to host
        RAM; level 2: weights dropped entirely (wake reloads from the
        model source). KV pages are freed either way."""
        if level >= 2:
            self._host_params = None
        else:
            self._host_params = jax.device_get(self.params)
        self.params = None
        self.kv_pages = None
        self._decode_cache = None
        self._sleeping = True

    def wake_up(self) -> None:
        if not getattr(self, "_sleeping", False):
            return
        if getattr(self, "_host_params", None) is not None:
            self.params = jax.device_put(self._host_params)
            self._host_params = None
        else:
            from vllm_omni_tpu.models.weights import load_model

            _, params, _ = load_model(self.config.model)
            self.params = params
        self.kv_pages = self._alloc_kv()
        self._sleeping = False

    def reload_weights(self, params: dict) -> None:
        """Swap in a new parameter pytree (reference: collective_rpc
        load_weights diffusion_worker.py:259 — RL rollout weight updates,
        LoRA activate/deactivate). A different structure (e.g. added LoRA
        leaves) simply retraces the step programs."""
        self.params = jax.device_put(params)
        self._decode_cache = None

    # -- host-side batch building -------------------------------------------
    def _page_bucket(self, max_pages: int) -> int:
        """Block-table width bucket. Floor of 32: every distinct width is
        a separately compiled program AND a decode-cache invalidation;
        the Pallas decode kernel only reads the pages context actually
        covers, so a wide table costs nothing on TPU."""
        b = 32
        while b < max_pages:
            b *= 2
        return min(b, max(self.max_pages_per_seq, 8))

    _PENALTY_BUCKETS = tuple(2 ** i for i in range(4, 18))

    def _prompt_token_buffer(self, reqs: list, b: int) -> np.ndarray:
        """[B, PB] int32 prompt-token buffer (-1 pad) for repetition
        penalty (vLLM spans prompt + output); PB bucketed power-of-2."""
        pb = pick_bucket(max(max(len(r.prompt_token_ids), 1)
                             for r in reqs), self._PENALTY_BUCKETS)
        buf = np.full((b, pb), -1, np.int32)
        for i, r in enumerate(reqs):
            toks = r.prompt_token_ids[:pb]
            buf[i, :len(toks)] = toks
        return buf

    def _block_table_rows(self, reqs: list, width: int) -> np.ndarray:
        bt = np.zeros((len(reqs), width), np.int32)
        for i, r in enumerate(reqs):
            ids = r.page_ids[:width]
            bt[i, :len(ids)] = ids
        return bt

    def execute_prefill(self, scheduled: list[ScheduledPrefill],
                        return_hidden: bool = False) -> StepResult:
        n = len(scheduled)
        b = pick_bucket(n, PREFILL_ROW_BUCKETS) if n <= \
            PREFILL_ROW_BUCKETS[-1] else n
        t = pick_bucket(max(s.length for s in scheduled),
                        self.config.scheduler.prefill_token_buckets)
        max_pages = max(len(s.request.page_ids) for s in scheduled)
        pw = self._page_bucket(max_pages)

        token_ids = np.zeros((b, t), np.int32)
        mrope = self.cfg.mrope_section is not None
        positions = np.zeros((b, 3, t) if mrope else (b, t), np.int32)
        slot_ids = np.zeros((b, t), np.int32)
        q_start = np.zeros((b,), np.int32)
        kv_lens = np.zeros((b,), np.int32)
        last_idx = np.zeros((b,), np.int32)
        step_ctr = np.zeros((b,), np.int32)
        reqs = [s.request for s in scheduled]
        bt = np.zeros((b, pw), np.int32)
        bt[:n] = self._block_table_rows(reqs, pw)
        with_embeds = any(s.request.prompt_embeds is not None
                          for s in scheduled)
        embeds = np.zeros((b, t, self.cfg.hidden_size), np.float32) \
            if with_embeds else np.zeros((1,), np.float32)
        embeds_mask = np.zeros((b, t), bool)
        for i, s in enumerate(scheduled):
            r = s.request
            toks = r.prompt_token_ids[s.start:s.start + s.length]
            if toks:
                token_ids[i, :s.length] = toks
            if r.prompt_embeds is not None:
                embeds[i, :s.length] = np.asarray(
                    r.prompt_embeds[s.start:s.start + s.length],
                    np.float32)
                if r.embeds_token_mask is not None:
                    embeds_mask[i, :s.length] = np.asarray(
                        r.embeds_token_mask[s.start:s.start + s.length])
                else:
                    embeds_mask[i, :s.length] = True
            if mrope:
                if r.mrope_positions is not None:
                    positions[i, :, :s.length] = np.asarray(
                        r.mrope_positions)[:, s.start:s.start + s.length]
                else:
                    positions[i, :, :s.length] = np.arange(
                        s.start, s.start + s.length)
            else:
                positions[i, :s.length] = np.arange(
                    s.start, s.start + s.length)
            # vectorized slot mapping (a 512-iteration Python loop here
            # cost ~ms of host time per prefill — TTFT-visible)
            pos = np.arange(s.start, s.start + s.length)
            pages = np.asarray(r.page_ids, np.int32)[pos // self.page_size]
            slot_ids[i, :s.length] = pages * self.page_size + \
                pos % self.page_size
            q_start[i] = s.start
            kv_lens[i] = s.start + s.length
            last_idx[i] = s.length - 1
        sampling = sampler_ops.make_sampling_arrays(
            [s.request.sampling_params for s in scheduled] +
            [None] * (b - n))
        use_penalties = any(
            s.request.sampling_params.repetition_penalty != 1.0
            or s.request.sampling_params.presence_penalty != 0.0
            or s.request.sampling_params.frequency_penalty != 0.0
            for s in scheduled)
        if use_penalties:
            prompt_buf = self._prompt_token_buffer(reqs, b)
            ob = pick_bucket(
                max(max(r.num_output_tokens, 1) for r in reqs),
                self._PENALTY_BUCKETS)
            out_buf = np.full((b, ob), -1, np.int32)
            for i, r in enumerate(reqs):
                o = r.output_token_ids[-ob:]
                out_buf[i, :len(o)] = o
        else:
            prompt_buf = out_buf = np.full((1, 1), -1, np.int32)
        use_bias = any(s.request.sampling_params.logit_bias
                       or s.request.guided_state is not None
                       for s in scheduled)
        if use_bias:
            bias = np.zeros((b, self.cfg.vocab_size), np.float32)
            for i, s in enumerate(scheduled):
                if s.request.guided_state is not None:
                    bias[i] = s.request.guided_state.mask_row()
                for tok, v in s.request.sampling_params.logit_bias.items():
                    if 0 <= int(tok) < self.cfg.vocab_size:
                        bias[i, int(tok)] += float(v)
        else:
            bias = np.zeros((1, 1), np.float32)

        if self.kv_quant != "none" and self.kv_scales is None \
                and self.pp == 1:
            # pp v1 quantizes with the legacy fixed scales (per-layer
            # stacked scan would need scales riding the scan xs)
            self._calibrate_kv_scales(token_ids, positions, q_start,
                                      kv_lens)
        fn = self._get_fn("prefill", return_hidden=return_hidden,
                          with_embeds=with_embeds, use_bias=use_bias,
                          use_penalties=use_penalties)
        out = fn(self.params, self.kv_pages, token_ids, positions, bt,
                 q_start, kv_lens, slot_ids, last_idx, sampling, step_ctr,
                 embeds, embeds_mask, bias, prompt_buf, out_buf)
        if return_hidden:
            ids, lp, self.kv_pages, hidden = out
        else:
            ids, lp, self.kv_pages = out
            hidden = None
        # ONE transfer RPC for everything host-bound: per-array
        # np.asarray costs a full device round trip EACH on
        # high-latency dispatch paths (measured ~24 ms/fetch through
        # the remote tunnel — it was the single largest TTFT component)
        if hidden is not None:
            ids_np, lp_np, h_np = jax.device_get((ids, lp, hidden))
        else:
            ids_np, lp_np = jax.device_get((ids, lp))
            h_np = None
        ids_np = ids_np[:n]
        lp_np = lp_np[:n]
        hs = {}
        if h_np is not None:
            for i, s in enumerate(scheduled):
                if s.request.sampling_params.return_hidden_states:
                    hs[s.request.request_id] = h_np[i, :s.length]
        return StepResult(
            req_ids=[r.request_id for r in reqs],
            token_ids=[int(x) for x in ids_np],
            logprobs=[float(x) for x in lp_np],
            hidden_states=hs)

    def launch_decode_multi(self, reqs: list[Request], k: int,
                            return_hidden: bool = False,
                            assumed_extra: int = 0):
        """Dispatch K chained decode steps; returns a handle for
        collect_decode_multi (the device round-trip happens there).
        Caller must have pre-allocated KV pages covering
        num_tokens + assumed_extra + k per request.

        Steady-state fast path: when the batch composition is unchanged
        since the previous chain, ALL device inputs (state, sampling,
        block tables) are reused from the device cache — the only wire
        traffic per chain is the sampled-ids pull. This is what makes
        decode survive a high-latency dispatch path (and shaves host work
        on any hardware).

        assumed_extra > 0 is the pipelined (async-chain) launch: a chain
        of that many steps is still in flight, so each request's true
        token count is num_tokens + assumed_extra, and the device inputs
        MUST come from the decode cache (the in-flight chain's
        device-resident carry) — returns None on a cache miss.
        """
        n = len(reqs)
        b = pick_bucket(n, self.config.scheduler.decode_bs_buckets)
        virtual = [r.num_tokens + assumed_extra for r in reqs]
        max_pages = max(cdiv(v + k, self.page_size) for v in virtual)
        pw = self._page_bucket(max_pages)
        use_penalties = any(
            r.sampling_params.repetition_penalty != 1.0
            or r.sampling_params.presence_penalty != 0.0
            or r.sampling_params.frequency_penalty != 0.0 for r in reqs)
        greedy_only = all(r.sampling_params.temperature == 0.0
                          for r in reqs)
        use_bias = any(r.sampling_params.logit_bias
                       or r.guided_state is not None for r in reqs)
        want_lps = any(r.sampling_params.logprobs is not None
                       for r in reqs)  # logprobs=0 is a valid request

        key = (tuple(r.request_id for r in reqs), b, pw, k,
               use_penalties, greedy_only, return_hidden, use_bias)
        bt = np.zeros((b, pw), np.int32)
        bt[:n] = self._block_table_rows(reqs, pw)
        c = self._decode_cache
        reuse = (not use_penalties and not use_bias and c is not None
                 and c["key"] == key
                 and c["expect_tokens"] == virtual)
        if assumed_extra and not reuse:
            return None  # pipelined launch needs the device-resident carry
        if reuse:
            self.decode_cache_hits += 1
        else:
            self.decode_cache_misses += 1
        if reuse:
            state = c["state"]
            f_s, i_s, out_tokens = c["f"], c["i"], c["o"]
            if np.array_equal(c["bt_np"], bt):
                bt_arg = c["bt"]
            else:  # a request crossed a page boundary → refresh bt only
                bt_arg = jax.device_put(bt)
                c["bt"], c["bt_np"] = bt_arg, bt
        else:
            state = np.zeros((4, b), np.int32)
            o_bucket = 1
            if use_penalties:
                o_bucket = pick_bucket(
                    max(max(r.num_output_tokens, 1) for r in reqs),
                    tuple(2 ** i for i in range(4, 16)))
            out_tokens = np.full((b, o_bucket), -1, np.int32)
            for i, r in enumerate(reqs):
                state[0, i] = r.output_token_ids[-1] if \
                    r.output_token_ids else (
                        r.prompt_token_ids[-1] if r.prompt_token_ids
                        else 0)
                state[1, i] = r.num_tokens - 1
                state[2, i] = r.num_output_tokens
                state[3, i] = r.mrope_delta
                if use_penalties and r.output_token_ids:
                    o = r.output_token_ids[-o_bucket:]
                    out_tokens[i, :len(o)] = o
            f_s, i_s = sampler_ops.pack_sampling(
                [r.sampling_params for r in reqs] + [None] * (b - n), b)
            bt_arg = bt

        self.forward_passes += k
        if use_bias:
            bias = np.zeros((b, self.cfg.vocab_size), np.float32)
            for i, r in enumerate(reqs):
                if r.guided_state is not None:
                    bias[i] = r.guided_state.mask_row()
                for tok, v in r.sampling_params.logit_bias.items():
                    if 0 <= int(tok) < self.cfg.vocab_size:
                        bias[i, int(tok)] += float(v)
        else:
            bias = np.zeros((1, 1), np.float32)
        prompt_buf = self._prompt_token_buffer(reqs, b) if use_penalties \
            else np.full((1, 1), -1, np.int32)
        use_cond = self.step_conditioner is not None
        aux = None
        if use_cond:
            if reuse and "ph" in (c or {}):
                ph = c["ph"]
                aux = c.get("aux")
            else:
                # hidden_{t-1} for each row's pending token: captured at
                # prefill end (engine stores it) or pulled back at the
                # previous chain's collect
                ph = np.zeros((b, self.cfg.hidden_size), np.float32)
                for i, r in enumerate(reqs):
                    h = r.additional_information.get("_cond_prev_hidden")
                    if h is not None:
                        ph[i] = np.asarray(h, np.float32)
                ab = self.step_conditioner.get("aux_builder")
                if ab is not None:
                    aux = jax.device_put(ab(reqs, b))
        else:
            ph = None
        fn = self._get_fn("decode_multi", k=k,
                          use_penalties=use_penalties,
                          return_hidden=return_hidden,
                          greedy_only=greedy_only, use_bias=use_bias,
                          use_cond=use_cond)
        args = (self.params, self.kv_pages, state, bt_arg, f_s, i_s,
                out_tokens, bias, prompt_buf)
        if use_cond:
            args = args + (ph, aux)
        out = fn(*args)
        codes = ph_f = None
        if use_cond:
            *out, codes, ph_f = out
        if return_hidden:
            ids, lps, self.kv_pages, next_state, hid = out
        else:
            ids, lps, self.kv_pages, next_state = out
            hid = None
        if not use_penalties and not use_bias:
            # stash device-resident inputs for the next chain
            if not reuse:
                f_s, i_s, out_tokens, bt_dev = jax.device_put(
                    (f_s, i_s, out_tokens, bt))
            else:
                bt_dev = bt_arg
            self._decode_cache = {
                "key": key, "state": next_state, "f": f_s, "i": i_s,
                "o": out_tokens, "bt": bt_dev, "bt_np": bt,
                "expect_tokens": [v + k for v in virtual],
            }
            if use_cond:
                self._decode_cache["ph"] = ph_f
                self._decode_cache["aux"] = aux
        else:
            self._decode_cache = None
        return {"ids": ids, "lps": lps, "hid": hid, "k": k, "n": n,
                "reqs": reqs, "want_lps": want_lps, "codes": codes,
                "ph": ph_f}

    def collect_decode_multi(self, handle) -> list[StepResult]:
        """Block on a launch_decode_multi handle and unpack per-step
        results (the only host↔device wire traffic of a cached chain)."""
        reqs, k, n = handle["reqs"], handle["k"], handle["n"]
        # ONE transfer RPC for the whole chain's host-bound results —
        # per-array np.asarray costs a full device round trip each on
        # high-latency dispatch paths (same fix as execute_prefill)
        fetch = {"ids": handle["ids"]}
        if handle["want_lps"]:
            fetch["lps"] = handle["lps"]
        if handle["hid"] is not None:
            fetch["hid"] = handle["hid"]
        if handle.get("codes") is not None:
            fetch["codes"] = handle["codes"]
        if handle.get("ph") is not None:
            fetch["ph"] = handle["ph"]
        got = jax.device_get(fetch)
        ids_np = got["ids"]  # [K, B]
        lps_np = got.get("lps")
        hid_np = got.get("hid")
        codes_np = got.get("codes")
        if "ph" in got:
            # keep hidden_{t-1} current host-side so the next chain can
            # rebuild the conditioner carry on a cache miss
            ph_np = got["ph"]
            for i, r in enumerate(reqs):
                r.additional_information["_cond_prev_hidden"] = ph_np[i]
        results = []
        for step in range(k):
            hs = {}
            if hid_np is not None:
                for i, r in enumerate(reqs):
                    if r.sampling_params.return_hidden_states:
                        hs[r.request_id] = hid_np[step, i]
            cd = {}
            if codes_np is not None:
                for i, r in enumerate(reqs):
                    cd[r.request_id] = codes_np[step, i]
            results.append(StepResult(
                req_ids=[r.request_id for r in reqs],
                token_ids=[int(x) for x in ids_np[step, :n]],
                logprobs=[float(x) for x in lps_np[step, :n]]
                if lps_np is not None else [0.0] * n,
                hidden_states=hs, codes=cd))
        return results

    def execute_decode_multi(self, reqs: list[Request], k: int,
                             return_hidden: bool = False
                             ) -> list[StepResult]:
        """K chained decode steps, one device round-trip
        (launch + collect)."""
        return self.collect_decode_multi(
            self.launch_decode_multi(reqs, k, return_hidden))

    def execute_decode(self, reqs: list[Request],
                       return_hidden: bool = False) -> StepResult:
        n = len(reqs)
        b = pick_bucket(n, self.config.scheduler.decode_bs_buckets)
        max_pages = max(len(r.page_ids) for r in reqs)
        pw = self._page_bucket(max_pages)
        use_penalties = any(
            r.sampling_params.repetition_penalty != 1.0
            or r.sampling_params.presence_penalty != 0.0
            or r.sampling_params.frequency_penalty != 0.0 for r in reqs)

        token_ids = np.zeros((b,), np.int32)
        positions = np.zeros((b,), np.int32)
        kv_lens = np.zeros((b,), np.int32)
        slot_ids = np.zeros((b,), np.int32)
        step_ctr = np.zeros((b,), np.int32)
        bt = np.zeros((b, pw), np.int32)
        bt[:n] = self._block_table_rows(reqs, pw)
        o_bucket = 0
        if use_penalties:
            o_bucket = pick_bucket(
                max(max(r.num_output_tokens, 1) for r in reqs),
                tuple(2 ** i for i in range(4, 16)))
        out_tokens = np.full((b, max(o_bucket, 1)), -1, np.int32)
        for i, r in enumerate(reqs):
            token_ids[i] = r.output_token_ids[-1] if r.output_token_ids \
                else (r.prompt_token_ids[-1] if r.prompt_token_ids else 0)
            pos = r.num_tokens - 1  # position of the token being fed
            positions[i] = pos
            kv_lens[i] = r.num_tokens
            page = r.page_ids[pos // self.page_size]
            slot_ids[i] = page * self.page_size + pos % self.page_size
            step_ctr[i] = r.num_output_tokens
            if use_penalties and r.output_token_ids:
                o = r.output_token_ids[-o_bucket:]
                out_tokens[i, :len(o)] = o
        sampling = sampler_ops.make_sampling_arrays(
            [r.sampling_params for r in reqs] + [None] * (b - n))

        prompt_buf = self._prompt_token_buffer(reqs, b) if use_penalties \
            else np.full((1, 1), -1, np.int32)
        fn = self._get_fn("decode", use_penalties=use_penalties,
                          return_hidden=return_hidden)
        out = fn(self.params, self.kv_pages, token_ids, positions, bt,
                 kv_lens, slot_ids, sampling, step_ctr, out_tokens,
                 prompt_buf)
        if return_hidden:
            ids, lp, self.kv_pages, last_h = out
        else:
            ids, lp, self.kv_pages = out
            last_h = None
        if last_h is not None:
            ids_np, lp_np, h_np = jax.device_get((ids, lp, last_h))
        else:
            ids_np, lp_np = jax.device_get((ids, lp))
            h_np = None
        ids_np, lp_np = ids_np[:n], lp_np[:n]
        hs = {}
        if h_np is not None:
            for i, r in enumerate(reqs):
                if r.sampling_params.return_hidden_states:
                    hs[r.request_id] = h_np[i]
        return StepResult(
            req_ids=[r.request_id for r in reqs],
            token_ids=[int(x) for x in ids_np],
            logprobs=[float(x) for x in lp_np],
            hidden_states=hs)
