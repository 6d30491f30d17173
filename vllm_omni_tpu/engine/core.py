"""Per-stage AR/generation engine core.

Ties the continuous-batching scheduler (core/scheduler.py) to the model
runner (worker/model_runner.py): one `step()` = one scheduler decision +
one jitted device program + host-side stop handling.

Reference parity: the vLLM v1 EngineCore busy loop the reference wraps per
stage (stage_engine_core_proc.py:41) plus OmniARScheduler's transfer-aware
finish (omni_ar_scheduler.py:64-67) and OmniGenerationScheduler's one-shot
mode (omni_generation_scheduler.py:36) — unified here.
"""

from __future__ import annotations

import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.outputs import CompletionOutput, RequestOutput
from vllm_omni_tpu.core.request import Request, RequestStatus
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.core.scheduler import Scheduler
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.weights import load_model
from vllm_omni_tpu.utils import random_uuid
from vllm_omni_tpu.worker.model_runner import ModelRunner, StepResult

logger = init_logger(__name__)


def _seed_params(params: SamplingParams) -> SamplingParams:
    """Unseeded sampling gets a fresh nondeterministic per-request seed
    at admission. Defaulting seed=None to a constant would hand every
    unseeded request the SAME counter-based PRNG stream — two concurrent
    requests with identical prompts would produce byte-identical
    'random' completions (vLLM uses an independent generator here)."""
    if params.seed is not None or params.temperature == 0.0:
        return params
    import dataclasses
    import os

    return dataclasses.replace(
        params, seed=int.from_bytes(os.urandom(4), "little"))


class EngineCore:
    """Single-stage engine: add_request / step / abort."""

    def __init__(self, config: EngineConfig, mesh=None,
                 tokenizer: Any = None) -> None:
        self.config = config
        self.tokenizer = tokenizer
        t0 = time.monotonic()
        if mesh is not None and mesh.shape.get("tp", 1) > 1:
            # fused qkv/gate_up layouts are single-device only: a
            # contiguous TP column split would mix q/k/v heads
            config.model.fused_qkv = False
        self.decoder_cfg, params, self.hf_config = load_model(config.model)
        self._maybe_bump_page_size(config)
        # auxiliary towers of a composite omni checkpoint (talker MTP
        # code predictor + thinker→talker projections, code2wav conv
        # tower) — see weights._load_omni_component
        self.aux = self.hf_config.pop("_aux", {}) if isinstance(
            self.hf_config, dict) else {}
        self.runner = ModelRunner(config, self.decoder_cfg, params,
                                  mesh=mesh)
        kvs = self.hf_config.pop("_kv_scales", None) if isinstance(
            self.hf_config, dict) else None
        if kvs is not None and self.runner.kv_quant != "none":
            # checkpoint-calibrated per-tensor KV scales (ModelOpt FP8)
            # broadcast per head; presence here suppresses the online
            # amax calibration (model_runner gates on kv_scales is None)
            k_sc, v_sc = kvs
            hkv = self.decoder_cfg.num_kv_heads
            self.runner.kv_scales = (
                np.repeat(np.asarray(k_sc, np.float32)[:, None], hkv, 1),
                np.repeat(np.asarray(v_sc, np.float32)[:, None], hkv, 1))
        if "fish" in self.aux:
            self._install_fish_conditioner()
        if "mimo" in self.aux:
            self._install_mimo_conditioner()
        if "qwen3_tts" in self.aux:
            from vllm_omni_tpu.models.qwen3_tts import (
                make_talker_conditioner)

            tts = self.aux["qwen3_tts"]
            fn, groups, aux_builder = make_talker_conditioner(
                tts["spec"], tts["aux"])
            self.runner.set_step_conditioner(fn, groups, aux_builder)
        if "voxtral" in self.aux:
            from vllm_omni_tpu.models.voxtral_tts import (
                make_voxtral_conditioner)

            vx = self.aux["voxtral"]
            fn, groups, aux_builder = make_voxtral_conditioner(
                vx["spec"], vx["aux"])
            self.runner.set_step_conditioner(fn, groups, aux_builder)
        self.scheduler = Scheduler(config.scheduler, config.cache,
                                   num_pages=self.runner.num_pages)
        self.eos_token_ids = self._resolve_eos()
        # async chain pipelining: (decodes, k, runner handle) of the
        # chain currently in flight (step() collects it next call)
        self._inflight = None
        self.async_chain_launches = 0
        self.mm_processor = None
        if config.model.mm_encoders:
            from vllm_omni_tpu.models.multimodal import MMProcessor

            self.mm_processor = MMProcessor(
                self.decoder_cfg.hidden_size, config.model.mm_encoders,
                dtype=jnp.bfloat16 if config.model.dtype == "bfloat16"
                else jnp.dtype(config.model.dtype),
                seed=config.model.seed)
        logger.info(
            "engine up in %.1fs: %d layers, %d KV pages (%s), mode=%s",
            time.monotonic() - t0, self.decoder_cfg.num_layers,
            self.runner.num_pages, config.model.kv_cache_dtype,
            config.scheduler.mode)

    def _maybe_bump_page_size(self, config: EngineConfig) -> None:
        """Small-head models (head_dim 64: Qwen2-0.5B class, encoders)
        take the Pallas paged-attention path through the lane-packed KV
        layout (ops/attention.py kv_physical_shape), which needs
        page_size >= pack x sublane-tile. Bump it before the scheduler
        and runner are built so both agree — otherwise decode silently
        falls back to the XLA gather path (round-1 verdict cliff)."""
        from vllm_omni_tpu.platforms import current_platform
        if not current_platform().supports_pallas:
            return
        from vllm_omni_tpu.ops.attention import min_page_size_for_pallas

        kv_dtype = config.model.kv_cache_dtype
        if kv_dtype == "auto":
            kv_dtype = config.model.dtype
        jdt = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8,
               "bfloat16": jnp.bfloat16,
               "float32": jnp.float32}[kv_dtype]
        need = min_page_size_for_pallas(self.decoder_cfg.head_dim, jdt)
        ps = config.cache.page_size
        if ps % need != 0:
            new_ps = need * max(1, (ps + need - 1) // need)
            logger.info("page_size %d -> %d (head_dim %d, kv %s: "
                        "lane-packed Pallas layout alignment)", ps,
                        new_ps, self.decoder_cfg.head_dim, kv_dtype)
            config.cache.page_size = new_ps

    def _resolve_eos(self) -> set[int]:
        eos = self.hf_config.get("eos_token_id")
        if eos is None:
            return set()
        return set(eos) if isinstance(eos, (list, tuple)) else {int(eos)}

    # -- request lifecycle --------------------------------------------------
    def add_request(self, prompt_token_ids: list[int],
                    sampling_params: Optional[SamplingParams] = None,
                    request_id: Optional[str] = None,
                    **kwargs: Any) -> str:
        rid = request_id or random_uuid()
        params = _seed_params(sampling_params or SamplingParams())
        max_len = self.config.model.max_model_len
        embeds = kwargs.get("prompt_embeds")
        n_prompt = len(prompt_token_ids) if prompt_token_ids else (
            int(embeds.shape[0]) if embeds is not None else 0)
        if n_prompt >= max_len:
            raise ValueError(
                f"prompt of {n_prompt} tokens exceeds "
                f"max_model_len={max_len}")
        if embeds is not None and "projections" in self.aux:
            # talker stage: thinker outputs project into talker dims
            # (reference project_thinker_outputs,
            # qwen3_omni_moe_talker.py:232). Text-token embeddings use
            # text_projection; hidden states use hidden_projection.
            from vllm_omni_tpu.models.qwen3_omni import resize_mlp

            which = (kwargs.get("additional_information") or {}).get(
                "projection", "hidden")
            proj = self.aux["projections"][
                "text_projection" if which == "text"
                else "hidden_projection"]

            kwargs["prompt_embeds"] = np.asarray(
                resize_mlp(proj, jnp.asarray(embeds, jnp.float32)))
        mm_inputs = kwargs.pop("mm_inputs", None)
        if mm_inputs:
            if self.mm_processor is None:
                raise ValueError(
                    "mm_inputs given but stage has no mm_encoders")
            pe, mask = self.mm_processor.process(prompt_token_ids,
                                                 mm_inputs)
            kwargs["prompt_embeds"] = pe
            kwargs["embeds_token_mask"] = mask
            if self.decoder_cfg.mrope_section is not None:
                mp, delta = self.mm_processor.compute_mrope_positions(
                    prompt_token_ids)
                kwargs["mrope_positions"] = mp
                kwargs["mrope_delta"] = delta
        if "mimo" in self.aux:
            kwargs = self._mimo_prepare_inputs(prompt_token_ids, kwargs)
        req = Request(request_id=rid, prompt_token_ids=list(prompt_token_ids),
                      sampling_params=params, **kwargs)
        if params.guided is not None:
            req.guided_state = self._make_guided_session()
        elif "mimo" in self.aux:
            # mimo global AR: capture hiddens so the finish hook can
            # expand <|empty|> audio patches into RVQ code groups
            import dataclasses

            req.sampling_params = dataclasses.replace(
                req.sampling_params, return_hidden_states=True)
        elif "fish" in self.aux:
            # fish slow AR: constant semantic-range logit mask + hidden
            # capture for residual-code expansion (fish_speech.py)
            import dataclasses

            from vllm_omni_tpu.models.fish_speech import (FixedLogitMask,
                                                          semantic_logit_mask)

            if not hasattr(self, "_fish_mask"):
                self._fish_mask = semantic_logit_mask(
                    self.decoder_cfg.vocab_size,
                    self.aux["fish"]["special"])
            req.guided_state = FixedLogitMask(self._fish_mask)
            req.sampling_params = dataclasses.replace(
                req.sampling_params, return_hidden_states=True)
        elif "qwen3_tts" in self.aux:
            # talker: only real codec ids [1, codebook_vocab) + codec
            # EOS may be sampled (reference _codec_allowed_mask,
            # qwen3_tts_talker.py:395); hidden capture feeds the
            # in-loop code predictor
            import dataclasses

            from vllm_omni_tpu.models.fish_speech import FixedLogitMask

            if not hasattr(self, "_tts_mask"):
                spec = self.aux["qwen3_tts"]["spec"]
                row = np.full((self.decoder_cfg.vocab_size,), -1e30,
                              np.float32)
                hi = min(spec.codebook_vocab_size,
                         self.decoder_cfg.vocab_size)
                row[1:hi] = 0.0
                if 0 <= spec.codec_eos_token_id < row.shape[0]:
                    row[spec.codec_eos_token_id] = 0.0
                self._tts_mask = row
            req.guided_state = FixedLogitMask(self._tts_mask)
            req.sampling_params = dataclasses.replace(
                req.sampling_params, return_hidden_states=True)
        elif "voxtral" in self.aux:
            # semantic head as lm_head: EMPTY_AUDIO and past-codebook
            # ids masked (reference FlowMatchingAudioTransformer.
            # forward:585-588); hidden capture feeds the in-loop
            # acoustic flow head
            import dataclasses

            from vllm_omni_tpu.models.fish_speech import FixedLogitMask
            from vllm_omni_tpu.models.voxtral_tts import (
                semantic_logit_mask as _vx_mask)

            if not hasattr(self, "_vx_logit_mask"):
                self._vx_logit_mask = _vx_mask(
                    self.aux["voxtral"]["spec"])
            req.guided_state = FixedLogitMask(self._vx_logit_mask)
            req.sampling_params = dataclasses.replace(
                req.sampling_params, return_hidden_states=True)
        self.scheduler.add_request(req)
        return rid

    def _make_guided_session(self):
        """Guided-decoding session over this stage's tokenizer vocab
        (core/guided.py); the token byte table is built once."""
        from vllm_omni_tpu.core.guided import GuidedSession, TokenByteTable

        if self.tokenizer is None:
            raise ValueError("guided decoding needs a tokenizer")
        if getattr(self, "_guided_table", None) is None:
            self._guided_table = TokenByteTable.from_tokenizer(
                self.tokenizer, self.cfg_vocab_size())
        return GuidedSession(self._guided_table, self.eos_token_ids)

    def cfg_vocab_size(self) -> int:
        return int(self.hf_config.get("vocab_size")
                   or self.decoder_cfg.vocab_size)

    def abort_request(self, request_id: str) -> bool:
        return self.scheduler.abort_request(request_id) is not None

    def notify_chunk(self, request_id: str, token_ids: list[int],
                     final: bool = False) -> None:
        """async_chunk streaming input: a new prompt chunk arrived
        (reference: WAITING_FOR_CHUNK patch.py:103 + resumable
        add_request async_omni_engine.py:965)."""
        self.scheduler.notify_chunk(request_id, token_ids, final)

    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished()

    # -- KV transfer (prefill/decode disaggregation) -------------------------
    def extract_request_kv(self, request_id: str) -> dict[str, Any]:
        """Pull a request's prompt KV off the device for transfer to
        another engine (reference handle_finished_requests_kv_transfer
        kv_transfer_manager.py:721). The request must still hold its
        pages (finish with pin_for_transfer, or mid-flight)."""
        req = self.scheduler.get_request(request_id)
        if req is None or not req.page_ids:
            raise KeyError(f"no live pages for request {request_id!r}")
        used_pages = (req.num_computed_tokens +
                      self.config.cache.page_size - 1) // \
            self.config.cache.page_size
        kv = self.runner.extract_kv(req.page_ids[:used_pages])
        return {
            "kv": kv,
            # quantized caches ship their per-head dequant scales: the
            # receiver adopts or rescales (inject_request_kv) — raw
            # int8/fp8 levels are meaningless without them
            "kv_scales": self.runner.kv_scales,
            "prompt_token_ids": list(req.prompt_token_ids),
            "num_computed_tokens": req.num_computed_tokens,
            "first_token": req.output_token_ids[0]
            if req.output_token_ids else None,
        }

    def release_transfer(self, request_id: str) -> None:
        self.scheduler.release_transfer(request_id)

    def _reconcile_kv_scales(self, kv, sender_scales):
        """Quantized transferred KV is raw int8/fp8 levels under the
        SENDER's per-head scales. If this engine has no scales yet,
        adopt the sender's (same checkpoint → same distribution); if it
        calibrated different ones, rescale the blob host-side so local
        dequant is exact. Hetero-TP slicing upstream keeps the Hkv wire
        axis, so per-head scales line up after slicing too."""

        local = self.runner.kv_scales
        if sender_scales is None or self.runner.kv_quant == "none":
            return kv
        if local is None:
            self.runner.kv_scales = sender_scales
            self.runner._fn_cache.clear()
            self.runner._decode_cache = None
            return kv
        k_s, v_s = sender_scales
        k_l, v_l = local
        if np.allclose(k_s, k_l) and np.allclose(v_s, v_l):
            return kv
        hkv = kv.shape[2]
        # wire [L, 2, Hkv, P, ps, D]; hetero-TP may have sliced heads —
        # scales slice identically (contiguous head ranges), so a
        # shape-based alignment is enough when hkv < full
        sc_send = np.stack([k_s[:, :hkv], v_s[:, :hkv]], axis=1)
        sc_loc = np.stack([k_l[:, :hkv], v_l[:, :hkv]], axis=1)
        ratio = (sc_send / sc_loc)[:, :, :, None, None, None]
        deq = kv.astype(np.float32) * ratio
        if self.runner.kv_quant == "int8":
            return np.clip(np.rint(deq), -127, 127).astype(np.int8)
        return deq.astype(kv.dtype)

    def inject_request_kv(self, payload: dict[str, Any],
                          sampling_params: Optional[SamplingParams] = None,
                          request_id: Optional[str] = None) -> str:
        """Admit a request whose prompt KV was computed elsewhere: pages
        are allocated, the KV scattered in, and the request enters the
        running set directly — decode continues with zero prompt
        recompute (reference re-injection, kv_transfer_manager.py:968;
        the PD-disaggregation fast path)."""
        rid = request_id or random_uuid()
        params = _seed_params(sampling_params or SamplingParams())
        prompt = list(payload["prompt_token_ids"])
        n_computed = int(payload["num_computed_tokens"])
        kv = payload["kv"]
        req = Request(request_id=rid, prompt_token_ids=prompt,
                      sampling_params=params)
        req.num_computed_tokens = n_computed
        first = payload.get("first_token")
        if first is not None:
            req.append_output_token(int(first))
        # pages must cover transferred KV + the next decode slot
        alloc = self.scheduler.block_manager.allocate(
            max(req.num_tokens, n_computed))
        req.page_ids = alloc.page_ids
        kv = self._reconcile_kv_scales(kv, payload.get("kv_scales"))
        self.runner.inject_kv(req.page_ids[:kv.shape[3]], kv)
        self.scheduler._all[rid] = req
        req.status = RequestStatus.WAITING
        self.scheduler.waiting.append(req)
        return rid

    # -- sleep mode ----------------------------------------------------------
    def sleep(self, level: int = 1) -> None:
        self._drain_inflight()
        if self.has_unfinished():
            raise RuntimeError("cannot sleep with requests in flight")
        self.runner.sleep(level)

    def wake_up(self) -> None:
        self.runner.wake_up()

    def reload_weights(self, params: dict) -> None:
        self.runner.reload_weights(params)

    # -- stepping -----------------------------------------------------------
    def _pick_lookahead(self) -> int:
        """Chained decode steps for the next schedule.

        The chain length stays at the configured multi_step whenever
        possible — every distinct k is a separately compiled program, and
        chain overshoot past max_tokens/eos is simply discarded host-side
        (step() breaks at the stop and the request's pages are freed).
        Only the hard max_model_len bound shrinks k: KV slots past the
        page table would clamp into the request's last page.
        """
        sc = self.config.scheduler
        if sc.multi_step <= 1 or self.scheduler.waiting or \
                not self.scheduler.running:
            return 1
        if any(r.guided_state is not None and
               getattr(r.guided_state, "dynamic", True)
               for r in self.scheduler.running):
            return 1  # grammar mask changes every token
        k = sc.multi_step
        for r in self.scheduler.running:
            k = min(k, self.config.model.max_model_len - r.num_tokens)
        k = max(1, k)
        for b in reversed(sc.multi_step_buckets):
            if b <= k:
                return b
        return 1

    def _spec_applicable(self) -> bool:
        sc = self.config.scheduler
        if sc.spec_gamma <= 0 or self.scheduler.waiting or \
                not self.scheduler.running:
            return False
        if self.runner.step_conditioner is not None:
            return False  # spec verify bypasses in-loop conditioning
        for r in self.scheduler.running:
            p = r.sampling_params
            if p.temperature != 0.0 or p.return_hidden_states or \
                    p.repetition_penalty != 1.0 or \
                    p.presence_penalty != 0.0 or \
                    p.frequency_penalty != 0.0 or \
                    r.guided_state is not None:
                return False
            if r.num_tokens + sc.spec_gamma + 1 > \
                    self.config.model.max_model_len:
                return False
        return True

    def _step_speculative(self) -> Optional[list[RequestOutput]]:
        """N-gram prompt-lookup speculation: propose from repeated
        context, verify γ+1 positions in ONE forward (reference keeps
        vLLM's spec-decode paths; on TPU this multiplies tokens per
        MXU weight pass at small batch)."""
        sc = self.config.scheduler
        proposals = {
            r.request_id: self.runner.ngram_propose(
                r.all_token_ids(), sc.spec_gamma, sc.spec_ngram)
            for r in self.scheduler.running}
        if not any(proposals.values()):
            return None  # nothing to speculate on — chain path is better
        sched = self.scheduler.schedule(lookahead=sc.spec_gamma + 1)
        if not sched.decodes:
            return None
        accepted = self.runner.execute_spec_verify(
            sched.decodes,
            [proposals.get(r.request_id, []) for r in sched.decodes],
            sc.spec_gamma)
        outputs = []
        for req, toks in zip(sched.decodes, accepted):
            fin = False
            for tok in toks:
                if fin:
                    break
                req.append_output_token(tok)
                fin = self._check_stop(req, tok)
            outputs.append(self._make_output(req, finished=fin))
        return outputs

    # -- omni family towers (talker MTP + code2wav) --------------------------
    def _apply_code_predictor(self, req: Request) -> None:
        """Talker finish hook: expand layer-0 codec codes into all RVQ
        groups with the MTP code predictor (reference
        code_predictor_forward, qwen3_omni_moe_talker.py:141). All codec
        frames run as ONE batched jit; result lands in
        additional_information["codec_codes"] as [G, T]."""

        from vllm_omni_tpu.models.qwen3_omni import code_predictor_generate
        from vllm_omni_tpu.utils import pick_bucket

        if "codec_codes" in req.additional_information:
            return
        cp_cfg, cp_params = self.aux["code_predictor"]
        hs = req.additional_information.get("hidden_states")
        if not hs or not req.output_token_ids:
            return
        all_h = np.concatenate([np.atleast_2d(np.asarray(h))
                                for h in hs], axis=0)
        n_prompt_h = all_h.shape[0] - max(0, req.num_output_tokens - 1)
        toks = list(req.output_token_ids)
        frames, frame_h = [], []
        for j, t in enumerate(toks):
            if t >= cp_cfg.vocab_size:
                continue  # codec specials (eos/pad/bos) carry no frame
            frames.append(t)
            frame_h.append(all_h[n_prompt_h - 1 + j])
        if not frames:
            return
        f = len(frames)
        b = pick_bucket(f, tuple(2 ** i for i in range(13)))
        codes0 = np.zeros((b,), np.int32)
        codes0[:f] = frames
        hid = np.zeros((b, cp_cfg.hidden_size), np.float32)
        hid[:f] = np.stack(frame_h)
        embed_tbl = self.runner.params["embed"]
        fn = self._cp_fns.get(b) if hasattr(self, "_cp_fns") else None
        if fn is None:
            if not hasattr(self, "_cp_fns"):
                self._cp_fns = {}

            def run(params, embed_tbl, codes0, hid):
                e0 = jnp.take(embed_tbl, codes0, axis=0).astype(
                    hid.dtype)
                codes, _ = code_predictor_generate(params, cp_cfg,
                                                   hid, e0)
                return codes

            fn = jax.jit(run)
            self._cp_fns[b] = fn
        residual = np.asarray(fn(cp_params, embed_tbl, codes0,
                                 hid))[:f]  # [F, G-1]
        codec = np.concatenate([np.asarray(frames)[None, :],
                                residual.T.astype(np.int64)], axis=0)
        req.additional_information["codec_codes"] = codec.tolist()

    def _mimo_prepare_inputs(self, prompt_token_ids: list[int],
                             kwargs: dict) -> dict:
        """Input-side MiMo-Audio: RVQ code groups riding
        additional_information["audio_codes"] ([T_groups, G, C] int)
        become prompt embeddings at the prompt's <|empty|> placeholder
        positions (reference get_input_embeddings — summed per-channel
        embeddings → non-causal input local transformer →
        speech_group_downcast; models/mimo_audio.py encode_groups)."""

        info = kwargs.get("additional_information") or {}
        codes = info.get("audio_codes")
        if codes is None:
            return kwargs
        from vllm_omni_tpu.models.mimo_audio import encode_groups

        mcfg, maux = self.aux["mimo"]
        codes = np.asarray(codes, np.int32)
        emb = np.asarray(encode_groups(maux, mcfg,
                                       jnp.asarray(codes[None])))[0]
        empty_id = mcfg.empty_token_id
        pos = [i for i, t in enumerate(prompt_token_ids)
               if t == empty_id]
        if len(pos) != emb.shape[0]:
            raise ValueError(
                f"audio_codes has {emb.shape[0]} groups but the prompt "
                f"has {len(pos)} <|empty|> placeholders")
        pe = np.zeros((len(prompt_token_ids), emb.shape[-1]), np.float32)
        mask = np.zeros((len(prompt_token_ids),), bool)
        for j, p in enumerate(pos):
            pe[p] = emb[j]
            mask[p] = True
        kwargs = dict(kwargs)
        kwargs["prompt_embeds"] = pe
        kwargs["embeds_token_mask"] = mask
        return kwargs

    def _apply_mimo_local_decode(self, req: Request) -> None:
        """MiMo-Audio finish hook: every sampled <|empty|> audio-patch
        token expands into a [G, C] group of RVQ codes via the local
        transformer, batched over patches (reference base_local_forward
        mimo_audio_llm.py:786 — a patch's codes depend only on the
        backbone hidden that sampled it). Result lands in
        additional_information["codec_codes"] as [C, T_patches*G]."""

        from vllm_omni_tpu.models.mimo_audio import local_decode
        from vllm_omni_tpu.utils import pick_bucket

        if "codec_codes" in req.additional_information:
            return
        mcfg, maux = self.aux["mimo"]
        rows = req.additional_information.get("codec_codes_rows")
        n_patches = sum(1 for t in req.output_token_ids
                        if t == mcfg.empty_token_id)
        if rows and len(rows) >= n_patches > 0:
            # in-loop conditioner streamed every patch's codes (and fed
            # the encoded patch back — the reference behavior)
            codes = np.stack(rows[:n_patches]).reshape(
                n_patches, mcfg.group_size, mcfg.audio_channels)
            flat = codes.reshape(n_patches * mcfg.group_size,
                                 mcfg.audio_channels)
            req.additional_information["codec_codes"] = \
                flat.T.astype(np.int64).tolist()
            return
        hs = req.additional_information.get("hidden_states")
        if not hs or not req.output_token_ids:
            return
        all_h = np.concatenate([np.atleast_2d(np.asarray(h))
                                for h in hs], axis=0)
        n_prompt_h = all_h.shape[0] - max(0, req.num_output_tokens - 1)
        patch_h = [all_h[n_prompt_h - 1 + j]
                   for j, t in enumerate(req.output_token_ids)
                   if t == mcfg.empty_token_id]
        if not patch_h:
            return
        f = len(patch_h)
        b = pick_bucket(f, tuple(2 ** i for i in range(13)))
        hid = np.zeros((b, mcfg.hidden_size), np.float32)
        hid[:f] = np.stack(patch_h)
        fn = getattr(self, "_mimo_fns", None)
        if fn is None or fn[0] != b:
            jit_fn = jax.jit(lambda aux, h: local_decode(aux, mcfg, h))
            self._mimo_fns = (b, jit_fn)
        codes = np.asarray(self._mimo_fns[1](maux, jnp.asarray(hid)))
        codes = codes[:f]  # [T_patches, G, C]
        flat = codes.reshape(f * mcfg.group_size, mcfg.audio_channels)
        req.additional_information["codec_codes"] =             flat.T.astype(np.int64).tolist()

    def _install_mimo_conditioner(self) -> None:
        """In-loop audio-patch conditioning (reference
        mimo_audio_llm.py:951 _generate_speech_tokens_and_audio
        _embeddings + :917 merge_mm_embedding): when an <|empty|> patch
        token is FED at step t, its input embedding is the
        input-local-transformer encoding of the codes the local decoder
        produced from hidden_{t-1} — not the static <|empty|> embed.
        The patch's [G, C] codes stream out flattened per step."""
        from vllm_omni_tpu.models.mimo_audio import (encode_groups,
                                                     local_decode)

        mcfg, maux = self.aux["mimo"]
        g, c = mcfg.group_size, mcfg.audio_channels
        empty = mcfg.empty_token_id

        def fn(tok, emb, ph, ctr):
            del ctr
            b = tok.shape[0]
            codes = local_decode(maux, mcfg,
                                 ph.astype(jnp.float32))  # [B, G, C]
            patch = encode_groups(maux, mcfg,
                                  codes[:, None])[:, 0]  # [B, H]
            valid = (tok == empty)[:, None]
            new_emb = jnp.where(valid, patch.astype(jnp.float32),
                                emb.astype(jnp.float32))
            flat = codes.reshape(b, g * c)
            out_codes = jnp.where(valid, flat, -1)
            return new_emb, out_codes

        self.runner.set_step_conditioner(fn, g * c)

    def _install_fish_conditioner(self) -> None:
        """In-loop slow-AR conditioning (reference talker_mtp,
        fish_speech_slow_ar.py:646): at decode step t the fast AR runs
        on (hidden_{t-1}, token_t) INSIDE the chained scan; the slow
        AR's input embedding for a semantic token becomes
        ``(embed + Σ_q codebook_embed(code_q + q·cb_size)) /
        sqrt(Q+1)`` and the residual codes stream out per step.
        Codes are greedy in-loop (the reference samples at temp 0.8 —
        determinism is chosen here; chain-seeded sampling is a later
        knob)."""
        from vllm_omni_tpu.models.fish_speech import fast_ar_predict

        fast_cfg, fast_params = self.aux["fish"]["fast"]
        special = self.aux["fish"]["special"]
        cb = self.aux["fish"].get("codebook_embeddings")
        if cb is None:
            logger.warning("fish: no codebook_embeddings — in-loop "
                           "conditioning disabled (finish-hook only)")
            return
        lo = special["semantic_start_token_id"]
        hi = special["semantic_end_token_id"]
        q = fast_cfg.num_codebooks
        cb_size = int(cb.shape[0]) // q
        norm = 1.0 / float(np.sqrt(q + 1))
        offsets = jnp.arange(q, dtype=jnp.int32) * cb_size

        def fn(tok, emb, ph, ctr):
            del ctr
            sem = jnp.clip(tok - lo, 0, fast_cfg.vocab_size - 1)
            codes = fast_ar_predict(fast_params, fast_cfg,
                                    ph.astype(emb.dtype), sem,
                                    key=None)  # [B, Q]
            idx = jnp.clip(codes, 0, cb_size - 1) + offsets[None]
            s = jnp.take(cb, idx, axis=0).sum(axis=1)
            valid = ((tok >= lo) & (tok <= hi))[:, None]
            new_emb = jnp.where(
                valid, (emb.astype(jnp.float32) +
                        s.astype(jnp.float32)) * norm,
                emb.astype(jnp.float32))
            out_codes = jnp.where(valid, codes, -1)
            return new_emb, out_codes

        self.runner.set_step_conditioner(fn, q)

    def _apply_fish_fast_ar(self, req: Request) -> None:
        """Fish Speech finish hook: expand the slow AR's semantic tokens
        into all residual codebook codes with the fast AR, vectorized
        over frames (reference talker_mtp, fish_speech_slow_ar.py:646;
        code_t depends only on (hidden_{t-1}, token_t), so the batched
        expansion reproduces the per-step path's codes). Result:
        additional_information["codec_codes"] [Q, T]."""

        from vllm_omni_tpu.models.fish_speech import fast_ar_predict
        from vllm_omni_tpu.utils import pick_bucket

        if "codec_codes" in req.additional_information:
            return
        fast_cfg, fast_params = self.aux["fish"]["fast"]
        special = self.aux["fish"]["special"]
        lo = special["semantic_start_token_id"]
        hi = special["semantic_end_token_id"]
        n_sem = sum(1 for t in req.output_token_ids if lo <= t <= hi)
        rows = req.additional_information.get("codec_codes_rows")
        if rows and len(rows) >= n_sem > 0:
            # in-loop conditioner already produced every frame's column
            # (and conditioned the slow AR on it — the reference
            # behavior); nothing left to expand
            req.additional_information["codec_codes"] = np.stack(
                rows[:n_sem]).T.astype(np.int64).tolist()
            return
        hs = req.additional_information.get("hidden_states")
        if not hs or not req.output_token_ids:
            return
        all_h = np.concatenate([np.atleast_2d(np.asarray(h))
                                for h in hs], axis=0)
        n_prompt_h = all_h.shape[0] - max(0, req.num_output_tokens - 1)
        frames, frame_h = [], []
        for j, t in enumerate(req.output_token_ids):
            if not (lo <= t <= hi):
                continue  # im_end / non-semantic tokens carry no frame
            frames.append(t - lo)
            frame_h.append(all_h[n_prompt_h - 1 + j])
        if not frames:
            return
        if rows:
            # streamed columns cover a prefix (max_tokens cutoff left
            # the final fed-never token without a chain step) — expand
            # only the remainder and concatenate
            done = len(rows)
            frames, frame_h = frames[done:], frame_h[done:]
            if not frames:
                req.additional_information["codec_codes"] = np.stack(
                    rows[:n_sem]).T.astype(np.int64).tolist()
                return
        f = len(frames)
        b = pick_bucket(f, tuple(2 ** i for i in range(13)))
        codes0 = np.zeros((b,), np.int32)
        codes0[:f] = frames
        hid = np.zeros((b, fast_cfg.text_dim), np.float32)
        hid[:f] = np.stack(frame_h)
        sampled = req.sampling_params.temperature > 0
        fn = getattr(self, "_fish_fns", {}).get((b, sampled))
        if fn is None:
            if not hasattr(self, "_fish_fns"):
                self._fish_fns = {}

            def run(params, hid, codes0, key):
                return fast_ar_predict(
                    params, fast_cfg, hid, codes0,
                    key=key if sampled else None)

            fn = jax.jit(run)
            self._fish_fns[(b, sampled)] = fn
        key = jax.random.PRNGKey(req.sampling_params.seed or 0)
        codes = np.asarray(fn(fast_params, hid, codes0, key))[:f]
        if rows:
            codes = np.concatenate([np.stack(rows), codes], axis=0)
        req.additional_information["codec_codes"] = \
            codes.T.astype(np.int64).tolist()  # [Q, T]

    def _step_code2wav_tok12(self) -> list[RequestOutput]:
        """Qwen3-TTS code2wav stage: codec columns → 24 kHz waveform
        through the REAL 12hz tokenizer decoder
        (models/qwen3_tts_tokenizer.py; reference
        qwen3_tts_code2wav.py + tokenizer_12hz V2 decoder). Chunked
        streaming decode (chunk 300, left context 25 — the reference's
        serving configuration) keeps per-chunk programs bucketed."""
        t_cfg, t_params = self.aux["code2wav_tok12"]
        dec = getattr(self, "_tok12_dec", None)
        if dec is None:
            from vllm_omni_tpu.models.qwen3_tts_tokenizer import (
                Tok12Decoder)

            dec = self._tok12_dec = Tok12Decoder(t_cfg, t_params)
        outputs: list[RequestOutput] = []
        ready = [r for r in list(self.scheduler.waiting)
                 if not r.resumable]
        for req in ready:
            codes = req.additional_information.get("codec_codes")
            if codes is not None:
                arr = np.asarray(codes, np.int32)  # [G, T]
            else:  # layer-0-only fallback (dummy tier)
                arr = np.zeros((t_cfg.num_quantizers,
                                max(len(req.prompt_token_ids), 1)),
                               np.int32)
                if req.prompt_token_ids:
                    arr[0] = np.clip(req.prompt_token_ids, 0,
                                     t_cfg.codebook_size - 1)
            g = min(arr.shape[0], t_cfg.num_quantizers)
            full = np.zeros((1, t_cfg.num_quantizers, arr.shape[1]),
                            np.int32)
            full[0, :g] = np.clip(arr[:g], 0, t_cfg.codebook_size - 1)
            wav = dec.chunked_decode(full)[0]
            self.scheduler.finish_request(req,
                                          RequestStatus.FINISHED_STOPPED)
            out = self._make_output(req, finished=True)
            out.multimodal_output = {"audio": {
                "data": wav.astype(np.float32),
                "sample_rate": t_cfg.output_sample_rate}}
            outputs.append(out)
        return outputs

    def _step_token2wav_25(self) -> list[RequestOutput]:
        """Qwen2.5-Omni token2wav stage: talker codec ids → waveform
        through the REAL flow-matching mel DiT + anti-aliased BigVGAN
        (models/qwen2_5_token2wav.py token2wav_generate; reference
        qwen2_5_omni_token2wav.py sample + BigVGAN forward). Reference
        mel / speaker vector ride additional_information (the
        reference's conditioning inputs)."""
        from vllm_omni_tpu.models.qwen2_5_token2wav import (
            token2wav_generate)

        bundle = self.aux["token2wav_25"]
        dit_cfg = bundle["dit"][0]
        outputs: list[RequestOutput] = []
        ready = [r for r in list(self.scheduler.waiting)
                 if not r.resumable]
        for req in ready:
            info = req.additional_information
            code = np.asarray(
                info.get("codec_codes", req.prompt_token_ids),
                np.int64).reshape(1, -1)
            code = np.clip(code, 0, dit_cfg.num_embeds)
            ref = info.get("ref_mel")
            ref = (np.asarray(ref, np.float32).reshape(
                1, -1, dit_cfg.mel_dim) if ref is not None else
                np.zeros((1, 8, dit_cfg.mel_dim), np.float32))
            spk = info.get("speaker_embedding")
            spk = (np.asarray(spk, np.float32).reshape(-1)
                   if spk is not None else
                   np.zeros((dit_cfg.enc_emb_dim,), np.float32))
            wav = token2wav_generate(
                bundle, code.astype(np.int32), ref, spk,
                num_steps=int(info.get("num_steps", 10)),
                guidance_scale=float(info.get("guidance_scale", 0.5)))
            self.scheduler.finish_request(req,
                                          RequestStatus.FINISHED_STOPPED)
            out = self._make_output(req, finished=True)
            out.multimodal_output = {"audio": {
                "data": wav[0].astype(np.float32),
                "sample_rate": 24000}}
            outputs.append(out)
        return outputs

    def _step_code2wav_voxtral(self) -> list[RequestOutput]:
        """Voxtral TTS audio_tokenizer stage: [T, K] code frames →
        waveform through the causal ALiBi codec decoder
        (models/voxtral_tts.py voxtral_code2wav; reference
        decode_helper_batch_async voxtral_tts_audio_tokenizer.py:1043
        — strip at END_AUDIO, −special offset, chunked decode)."""
        from vllm_omni_tpu.models.voxtral_tts import (strip_at_eoa,
                                                      voxtral_code2wav)
        from vllm_omni_tpu.utils import pick_bucket

        cargs, cparams = self.aux["code2wav_voxtral"]
        outputs: list[RequestOutput] = []
        ready = [r for r in list(self.scheduler.waiting)
                 if not r.resumable]
        for req in ready:
            codes = req.additional_information.get("codec_codes")
            if codes is not None:
                arr = np.asarray(codes, np.int32)  # [T, K]
            else:  # dummy tier: layer-0 only
                t = max(len(req.prompt_token_ids), 1)
                arr = np.full((t, 1 + cargs.acoustic_dim), 2, np.int32)
            raw = strip_at_eoa(arr)
            if raw.shape[0] == 0:
                wav = np.zeros((0,), np.float32)
            else:
                t = raw.shape[0]
                b = pick_bucket(t, tuple(2 ** i for i in range(14)))
                padded = np.zeros((1, raw.shape[1], b), np.int32)
                padded[0, :, :t] = raw.T
                fn = getattr(self, "_vx_c2w_fns", None) or {}
                if b not in fn:
                    fn[b] = jax.jit(
                        lambda p, c: voxtral_code2wav(p, cargs, c))
                    self._vx_c2w_fns = fn
                wav = np.asarray(fn[b](cparams, jnp.asarray(padded)),
                                 np.float32)[0]
                wav = wav[:t * cargs.downsample_factor]
            self.scheduler.finish_request(req,
                                          RequestStatus.FINISHED_STOPPED)
            out = self._make_output(req, finished=True)
            out.multimodal_output = {"audio": {
                "data": wav, "sample_rate": cargs.sampling_rate}}
            outputs.append(out)
        return outputs

    def _step_code2wav(self) -> list[RequestOutput]:
        """code2wav stage: codec codes → waveform, bypassing the
        decoder entirely (reference runs code2wav as a generation-worker
        stage, qwen3_omni_code2wav.py:122; batched decode is the 30%
        E2E win of async_chunk_design.md:51)."""

        from vllm_omni_tpu.models.qwen3_omni import code2wav_forward
        from vllm_omni_tpu.utils import pick_bucket

        c2w_cfg, c2w_params = self.aux["code2wav"]
        outputs: list[RequestOutput] = []
        ready = [r for r in list(self.scheduler.waiting)
                 if not r.resumable]  # final chunk clears resumable
        if not ready:
            return outputs
        fn = getattr(self, "_c2w_fn", None)
        if fn is None:
            fn = jax.jit(lambda p, c: code2wav_forward(p, c2w_cfg, c))
            self._c2w_fn = fn
        for req in ready:
            codes = req.additional_information.get("codec_codes")
            if codes is not None:
                arr = np.asarray(codes, np.int32)  # [G, T]
            else:  # layer-0-only fallback (random tier)
                arr = np.zeros((c2w_cfg.num_quantizers,
                                len(req.prompt_token_ids)), np.int32)
                arr[0] = np.clip(req.prompt_token_ids, 0,
                                 c2w_cfg.codebook_size - 1)
            t = arr.shape[1]
            tb = pick_bucket(t, tuple(2 ** i for i in range(4, 15)))
            padded = np.zeros((1, c2w_cfg.num_quantizers, tb), np.int32)
            g = min(arr.shape[0], c2w_cfg.num_quantizers)
            padded[0, :g, :t] = np.clip(
                arr[:g], 0, c2w_cfg.codebook_size - 1)
            wav = np.asarray(fn(c2w_params, padded))[
                0, :t * c2w_cfg.total_upsample]
            self.scheduler.finish_request(req,
                                          RequestStatus.FINISHED_STOPPED)
            out = self._make_output(req, finished=True)
            out.multimodal_output = {"audio": {
                "data": wav.astype(np.float32),
                "sample_rate": 24000}}
            outputs.append(out)
        return outputs

    # -- async chain pipelining ----------------------------------------------
    def _maybe_pipeline(self, decodes: list[Request], k: int) -> None:
        """Launch the NEXT decode chain from the device-resident carry
        before the current chain's ids are pulled — the host round-trip
        and scheduling overlap device compute (reference role: vLLM v1
        async scheduling). Only in unchanged-batch steady state: any
        waiting work, finish, or cache miss falls back to sync chains.
        Chain overshoot past a stop is discarded like any multi-step
        overshoot; KV written past a freed request's final token lands
        in slots no later owner ever reads before writing."""
        sc = self.config.scheduler
        if not sc.async_chains or sc.multi_step <= 1 or sc.spec_gamma > 0:
            return
        if self.scheduler.waiting or \
                list(self.scheduler.running) != decodes:
            return
        if any(r.sampling_params.return_hidden_states
               or r.guided_state is not None for r in decodes):
            return
        if all(r.sampling_params.max_tokens - r.num_output_tokens <= k
               for r in decodes):
            return  # every request finishes inside the current chain
        k2 = sc.multi_step
        for r in decodes:
            k2 = min(k2, self.config.model.max_model_len -
                     (r.num_tokens + k))
        buckets = [b for b in sc.multi_step_buckets if b <= k2]
        if not buckets:
            return
        k2 = buckets[-1]
        if not self.scheduler.extend_for_async(decodes, k + k2):
            return  # page pressure: never preempt for speculative work
        handle = self.runner.launch_decode_multi(decodes, k2,
                                                 assumed_extra=k)
        if handle is not None:
            self._inflight = (decodes, k2, handle)
            self.async_chain_launches += 1

    def _collect_inflight(self) -> list[RequestOutput]:
        decodes, k, handle = self._inflight
        self._inflight = None
        # keep the pipeline full: launch chain N+2 before blocking on
        # N+1 (valid only if N's processing finished nothing)
        self._maybe_pipeline(decodes, k)
        results = self.runner.collect_decode_multi(handle)
        return self._process_decode_results(decodes, results)

    def _drain_inflight(self) -> None:
        if self._inflight is not None:
            decodes, _, handle = self._inflight
            self._inflight = None
            results = self.runner.collect_decode_multi(handle)
            self._process_decode_results(decodes, results)

    def _process_decode_results(self, decodes, results
                                ) -> list[RequestOutput]:
        outputs: list[RequestOutput] = []
        for i, req in enumerate(decodes):
            if req not in self.scheduler.running:
                continue  # finished/aborted while the chain was in flight
            fin = False
            for step_res in results:
                if fin:
                    break  # discard chain overshoot past a stop
                token = step_res.token_ids[i]
                req.append_output_token(
                    token, step_res.logprobs[i]
                    if req.sampling_params.logprobs is not None and
                    step_res.logprobs else None)
                h = step_res.hidden_states.get(req.request_id)
                if h is not None:
                    req.additional_information.setdefault(
                        "hidden_states", []).append(h)
                cd = step_res.codes.get(req.request_id)
                if cd is not None and int(cd[0]) >= 0:
                    # in-loop conditioner: this step FED a semantic
                    # token; cd holds that frame's full codebook column
                    req.additional_information.setdefault(
                        "codec_codes_rows", []).append(
                        np.asarray(cd, np.int32))
                fin = self._check_stop(req, token)
            outputs.append(self._make_output(req, finished=fin))
        return outputs

    def step(self) -> list[RequestOutput]:
        if "code2wav" in self.aux:
            return self._step_code2wav()
        if "code2wav_tok12" in self.aux:
            return self._step_code2wav_tok12()
        if "code2wav_voxtral" in self.aux:
            return self._step_code2wav_voxtral()
        if "token2wav_25" in self.aux:
            return self._step_token2wav_25()
        if self._inflight is not None:
            return self._collect_inflight()
        if self._spec_applicable():
            out = self._step_speculative()
            if out is not None:
                return out
        sched = self.scheduler.schedule(lookahead=self._pick_lookahead())
        outputs: list[RequestOutput] = []
        for req in sched.completed_generation:
            self.scheduler.finish_request(req, RequestStatus.FINISHED_STOPPED)
            outputs.append(self._make_output(req, finished=True))
        if sched.is_empty:
            return outputs

        if sched.prefills:
            want_hidden = any(
                s.request.sampling_params.return_hidden_states
                for s in sched.prefills)
            result = self.runner.execute_prefill(
                sched.prefills, return_hidden=want_hidden)
            for i, s in enumerate(sched.prefills):
                req = s.request
                rid_hidden = result.hidden_states.get(req.request_id)
                if rid_hidden is not None:
                    req.additional_information.setdefault(
                        "hidden_states", []).append(rid_hidden)
                    if self.runner.step_conditioner is not None:
                        # hidden of the last prompt position = the
                        # state that samples the first output token
                        # (hidden_{t-1} for the conditioner's step 1)
                        req.additional_information[
                            "_cond_prev_hidden"] = np.asarray(
                            rid_hidden)[-1]
                self.scheduler.complete_prefill(s)
                if not req.prefill_done:
                    continue  # more chunks to go
                if self.config.scheduler.mode == "generation" and \
                        not req.resumable:
                    # one-shot stage: done at prefill end
                    self.scheduler.finish_request(
                        req, RequestStatus.FINISHED_STOPPED)
                    outputs.append(self._make_output(req, finished=True))
                    continue
                if req.status == RequestStatus.WAITING_FOR_CHUNK:
                    # stream the chunk's product (hidden states = audio
                    # for code2wav-role stages) as a mid-flight output:
                    # the pipeline's first perceivable output (TTFP)
                    # leaves as soon as the first chunk is decoded
                    # (reference async_chunk_design.md:38-50 — audio
                    # chunks in deltas, 6459→523 ms TTFP)
                    if rid_hidden is not None:
                        outputs.append(self._make_output(
                            req, finished=False,
                            chunk_hidden=rid_hidden))
                    continue  # resumable: wait for more input
                # sample the first output token from the prefill logits
                token = result.token_ids[i]
                req.append_output_token(
                    token, result.logprobs[i]
                    if req.sampling_params.logprobs is not None and
                    result.logprobs else None)
                fin = self._check_stop(req, token)
                outputs.append(self._make_output(req, finished=fin))
        elif sched.decodes:
            want_hidden = any(r.sampling_params.return_hidden_states
                              for r in sched.decodes)
            handle = self.runner.launch_decode_multi(
                sched.decodes, sched.lookahead, return_hidden=want_hidden)
            if not want_hidden:
                self._maybe_pipeline(sched.decodes, sched.lookahead)
            results = self.runner.collect_decode_multi(handle)
            outputs.extend(
                self._process_decode_results(sched.decodes, results))
        return outputs

    def run_to_completion(self) -> list[RequestOutput]:
        """Drain the queue; return the final output per request."""
        finals: dict[str, RequestOutput] = {}
        while self.has_unfinished():
            for out in self.step():
                if out.finished:
                    finals[out.request_id] = out
        return list(finals.values())

    # -- stop handling ------------------------------------------------------
    def _check_stop(self, req: Request, token: int) -> bool:
        p = req.sampling_params
        n_out = req.num_output_tokens
        status: Optional[RequestStatus] = None
        if n_out >= p.max_tokens:
            status = RequestStatus.FINISHED_LENGTH_CAPPED
        elif req.num_tokens >= self.config.model.max_model_len:
            status = RequestStatus.FINISHED_LENGTH_CAPPED
        elif n_out >= p.min_tokens:
            if not p.ignore_eos and token in self.eos_token_ids:
                status = RequestStatus.FINISHED_STOPPED
            elif token in set(p.stop_token_ids):
                status = RequestStatus.FINISHED_STOPPED
            elif p.stop and self.tokenizer is not None:
                text = self.tokenizer.decode(req.output_token_ids)
                if any(s in text for s in p.stop):
                    status = RequestStatus.FINISHED_STOPPED
        if status is None:
            return False
        self.scheduler.finish_request(
            req, status,
            pin_for_transfer=req.sampling_params.pin_kv)
        return True

    # -- outputs ------------------------------------------------------------
    def _make_output(self, req: Request, finished: bool,
                     chunk_hidden=None) -> RequestOutput:
        if finished and "code_predictor" in self.aux:
            self._apply_code_predictor(req)
        if finished and "fish" in self.aux:
            self._apply_fish_fast_ar(req)
        if finished and "mimo" in self.aux:
            self._apply_mimo_local_decode(req)
        if finished and "qwen3_tts" in self.aux:
            rows = req.additional_information.get("codec_codes_rows")
            if rows and "codec_codes" not in req.additional_information:
                # each decode step fed one codec frame; the in-loop
                # predictor streamed its full column (talker_mtp)
                req.additional_information["codec_codes"] = np.stack(
                    rows).T.astype(np.int64).tolist()  # [G, T]
        if finished and "voxtral" in self.aux:
            rows = req.additional_information.get("codec_codes_rows")
            if rows and "codec_codes" not in req.additional_information:
                # per-step [semantic, acoustic×N] frames (conditioner
                # streamed them); downstream audio_tokenizer stage
                # consumes [T, K]
                req.additional_information["codec_codes"] = np.stack(
                    rows).astype(np.int64).tolist()  # [T, K]
        text = ""
        if finished and self.tokenizer is not None and \
                req.sampling_params.detokenize:
            text = self.tokenizer.decode(req.output_token_ids,
                                         skip_special_tokens=True)
        comp = CompletionOutput(
            index=0, text=text, token_ids=list(req.output_token_ids),
            finish_reason=req.status.finish_reason if finished else None)
        if req.sampling_params.logprobs is not None and \
                len(req.output_logprobs) == len(req.output_token_ids):
            comp.logprobs = [{int(t): lp} for t, lp in
                             zip(req.output_token_ids,
                                 req.output_logprobs)]
        if finished and req.additional_information.get("hidden_states"):

            hs = req.additional_information["hidden_states"]
            comp.hidden_states = np.concatenate(
                [np.atleast_2d(h) for h in hs], axis=0)
        elif chunk_hidden is not None:
            # mid-flight streamed chunk: ONLY the new chunk's product
            # (receivers append deltas; the finished output still
            # carries the full concatenation)

            comp.hidden_states = np.atleast_2d(chunk_hidden)
        return RequestOutput(
            request_id=req.request_id,
            prompt_token_ids=list(req.prompt_token_ids),
            outputs=[comp], finished=finished,
            additional_information=req.additional_information
            if finished else {},
            metrics=self._metrics(req) if finished else {})

    def _metrics(self, req: Request) -> dict[str, float]:
        m: dict[str, float] = {}
        if req.first_token_time is not None:
            m["ttft_s"] = req.first_token_time - req.arrival_time
        if req.finish_time is not None:
            m["e2e_s"] = req.finish_time - req.arrival_time
            if req.num_output_tokens > 1 and req.first_token_time:
                m["tpot_s"] = ((req.finish_time - req.first_token_time) /
                               max(1, req.num_output_tokens - 1))
        return m
