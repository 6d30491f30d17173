"""Multi-stage pipeline orchestration.

Reference parity: engine/orchestrator.py:108 (`Orchestrator`:
`_orchestration_loop` :227, `_route_output` :322, `_forward_to_next_stage`
:521) and AsyncOmniEngine's stage bring-up (async_omni_engine.py:234).

Stage topology: multi-stage pipelines default to **process-per-stage**
(the reference's default, stage_engine_core_proc.py:41): each stage is a
StageProcClient / DiffusionProcClient subprocess with a ZMQ control+data
plane, so a crashing stage surfaces as per-request errors (plus elastic
respawn) instead of taking the engine down. Single-stage pipelines run
inline (the reference's InlineStageDiffusionClient pattern,
inline_stage_diffusion_client.py:1-10, generalized), as do multi-stage
pipelines on a single shared accelerator where separate processes cannot
share the chip (see `_default_isolation`). `process_isolation:
true|false` in a stage's engine_args overrides per stage;
OMNI_TPU_INLINE_STAGES=1 forces inline globally (the CPU unit-test tier
uses this for speed, mirroring the reference's mocked CPU tier).

Stage input processors glue stage N outputs into stage N+1 prompts
(reference: stage_input_processors/*.py, e.g. thinker2talker
qwen3_omni.py:174): dotted-path callables
``fn(prev_outputs, stage_cfg, ctx) -> add_request kwargs``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from collections import OrderedDict
from typing import Any, Callable, Optional

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.config.stage_config import ModelPipeline, StageConfig
from vllm_omni_tpu.core.outputs import RequestOutput
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.tokenizer import get_tokenizer

logger = init_logger(__name__)


def default_process_input(prev_outputs: dict[int, RequestOutput],
                          stage: StageConfig,
                          ctx: dict[str, Any]) -> dict[str, Any]:
    """Default stage-input glue.

    → LLM stage: source hidden states as an embeddings prompt, else its
      output token ids.
    → diffusion stage: source hidden states as text conditioning
      (`text_states`), source text as the prompt.
    """
    src_id = stage.engine_input_source[0] if stage.engine_input_source \
        else max(prev_outputs)
    prev = prev_outputs[src_id]
    comp = prev.outputs[0]
    info = dict(prev.additional_information)
    info.pop("hidden_states", None)
    if stage.stage_type == "diffusion":
        kwargs: dict[str, Any] = {"prompt": comp.text or "",
                                  "additional_information": info}
        if comp.hidden_states is not None:
            kwargs["additional_information"]["text_states"] = \
                comp.hidden_states
        companion = (ctx.get("companions") or {}).get(src_id)
        if companion is not None and companion.outputs and \
                companion.outputs[0].hidden_states is not None:
            kwargs["additional_information"]["negative_text_states"] = \
                companion.outputs[0].hidden_states
        return kwargs
    kwargs = {"additional_information": info}
    if comp.hidden_states is not None:
        kwargs["prompt_token_ids"] = []
        kwargs["prompt_embeds"] = comp.hidden_states
    else:
        kwargs["prompt_token_ids"] = list(comp.token_ids)
    return kwargs


@dataclass
class PipelineRequest:
    request_id: str
    modality: str  # requested final output modality
    sampling_params: SamplingParams
    arrival_time: float = field(default_factory=time.monotonic)
    stage_outputs: dict[int, RequestOutput] = field(default_factory=dict)
    dispatched_stages: set[int] = field(default_factory=set)
    final_output: Optional[RequestOutput] = None
    stage_durations: dict[str, float] = field(default_factory=dict)
    stage_start: dict[int, float] = field(default_factory=dict)
    diffusion_params: Any = None  # user DiffusionSamplingParams, if any
    # async_chunk bookkeeping: consumer stage_id → tokens forwarded /
    # chunked-request started
    chunk_sent: dict[int, int] = field(default_factory=dict)
    chunk_started: set[int] = field(default_factory=set)
    # per-consumer NEXT chunk size (geometric growth after chunk 1)
    chunk_size: dict[int, int] = field(default_factory=dict)
    # cross-stage CFG companions: source stage_id → negative-branch
    # output (reference orchestrator companion map orchestrator.py:141)
    companion_outputs: dict[int, RequestOutput] = field(
        default_factory=dict)
    companion_pending: set[int] = field(default_factory=set)
    # whether the user supplied sampling params (False = stage defaults
    # govern; an explicit SamplingParams() would override them)
    user_params: bool = True


class _StageHandle:
    """Uniform add/step interface over AR (EngineCore) and diffusion
    (DiffusionEngine) stages; normalizes outputs to RequestOutput."""

    def __init__(self, stage: StageConfig, engine: Any, kind: str) -> None:
        self.stage = stage
        self.engine = engine
        self.kind = kind  # "llm" | "diffusion"
        # inter-stage output cache (reference OmniTensorPrefixCache
        # role): finished outputs keyed by (prompt, params) replay for
        # identical requests — deterministic stages only (YAML opt-in)
        self._out_cache: "OrderedDict[tuple, RequestOutput]" = \
            OrderedDict()
        self._cache_replay: list[RequestOutput] = []

    def has_unfinished(self) -> bool:
        return bool(self._cache_replay) or self.engine.has_unfinished()

    @staticmethod
    def _cache_key(payload: dict[str, Any]) -> Optional[tuple]:
        import dataclasses

        sp = payload.get("sampling_params")
        toks = payload.get("prompt_token_ids")
        if sp is None or not toks or payload.get("resumable") or \
                payload.get("mm_inputs") or \
                payload.get("additional_information") or \
                payload.get("prompt_embeds") is not None:
            return None  # only plain deterministic token prompts cache
        if getattr(sp, "temperature", 1.0) != 0.0:
            return None
        def repr_safe(v) -> bool:
            # repr() of e.g. numpy arrays truncates — distinct requests
            # could collide; only plain scalars/containers may key
            if isinstance(v, (int, float, bool, str, bytes,
                              type(None))):
                return True
            if isinstance(v, (tuple, list)):
                return all(repr_safe(x) for x in v)
            if isinstance(v, dict):
                return all(isinstance(k, str) and repr_safe(x)
                           for k, x in v.items())
            return False

        items = sorted(dataclasses.asdict(sp).items())
        if not all(repr_safe(v) for _, v in items):
            return None
        return (tuple(toks),
                tuple((k, repr(v)) for k, v in items if k != "seed"))

    def add(self, request_id: str, payload: dict[str, Any]) -> None:
        if self.kind == "llm":
            key = None
            if self.stage.cache_outputs:
                key = self._cache_key(payload)
                hit = self._out_cache.get(key) if key else None
                if hit is not None:
                    self._out_cache.move_to_end(key)
                    import copy

                    # deep copy: routing and post-processors mutate
                    # outputs in place (stage_durations, multimodal
                    # dicts) — shallow copies would share state across
                    # concurrent replayed requests
                    replay = copy.deepcopy(hit)
                    replay.request_id = request_id
                    self._cache_replay.append(replay)
                    return
                self._pending_cache_key = getattr(
                    self, "_pending_cache_key", {})
                if key is not None:
                    self._pending_cache_key[request_id] = key
            sp = payload.pop("sampling_params")
            self.engine.add_request(
                payload.pop("prompt_token_ids", []), sp,
                request_id=request_id, **payload)
            return
        from vllm_omni_tpu.core.request import DiffusionRequest

        self.engine.add_request(DiffusionRequest(
            request_id=request_id,
            prompt=payload.get("prompt", ""),
            params=payload["diffusion_params"],
            negative_prompt=payload.get("negative_prompt"),
            additional_information=payload.get("additional_information",
                                               {})))

    def step(self) -> list[RequestOutput]:
        if self.kind == "llm":
            outs = self.engine.step()
            if self._cache_replay:
                outs = list(outs) + self._cache_replay
                self._cache_replay = []
            if self.stage.cache_outputs:
                pend = getattr(self, "_pending_cache_key", {})
                for o in outs:
                    key = pend.pop(o.request_id, None) \
                        if o.finished else None
                    if key is not None and o.error is None:
                        import copy

                        # snapshot BEFORE routing mutates the object
                        self._out_cache[key] = copy.deepcopy(o)
                        while len(self._out_cache) > \
                                self.stage.cache_outputs_capacity:
                            self._out_cache.popitem(last=False)
            return outs
        outs = []
        for d in self.engine.step():
            if not d.finished:
                continue
            ro = RequestOutput(request_id=d.request_id, finished=True,
                               stage_id=self.stage.stage_id,
                               final_output_type=self.stage
                               .final_output_type, error=d.error)
            from vllm_omni_tpu.core.outputs import CompletionOutput

            ro.outputs = [CompletionOutput(index=0, text="", token_ids=[])]
            if d.images is not None:
                ro.multimodal_output["image"] = d.images
            if getattr(d, "video", None) is not None:
                ro.multimodal_output["video"] = d.video
            if getattr(d, "audio", None) is not None:
                ro.multimodal_output["audio"] = d.audio
            if d.latents is not None:
                ro.multimodal_output["latent"] = d.latents
            ro.stage_durations = dict(d.stage_durations)
            outs.append(ro)
        return outs


class PipelineRunner:
    """Synchronous multi-stage driver: all stage engines stepped from one
    loop, outputs routed along the DAG."""

    @staticmethod
    def _default_isolation(pipeline: ModelPipeline) -> bool:
        """Process-per-stage by default for multi-stage pipelines
        (reference default topology, stage_engine_core_proc.py:41) —
        except where separate processes cannot coexist: single-stage
        pipelines (inline is strictly better), a shared single
        accelerator (two JAX processes cannot both own one TPU chip —
        requires every stage to pin explicit disjoint `runtime.devices`),
        or an explicit OMNI_TPU_INLINE_STAGES=1 override."""
        import os

        if os.environ.get("OMNI_TPU_INLINE_STAGES") == "1":
            return False
        if len(pipeline.stages) <= 1:
            return False
        from vllm_omni_tpu.platforms import current_platform

        if current_platform().is_cpu:
            return True  # host processes always coexist
        seen: set[int] = set()
        for s in pipeline.stages:
            if s.runtime.devices in ("all", "", None):
                return False  # unpinned stage could share the chip
            devs = set(s.runtime.device_indices(total=0))
            if seen & devs:
                return False
            seen |= devs
        return True

    def __init__(self, pipeline: ModelPipeline,
                 default_model: Optional[str] = None) -> None:
        self.pipeline = pipeline
        self.handles: dict[int, _StageHandle] = {}
        self.processors: dict[int, Callable] = {}
        self.tokenizer = None
        self.master = None
        if any(s.engine_args.get("placement") == "remote"
               for s in pipeline.stages):
            import os

            from vllm_omni_tpu.engine.master import OmniMasterServer

            # fix the port via OMNI_TPU_MASTER_PORT to launch workers
            # before/while the runner initializes
            self.master = OmniMasterServer(
                port=int(os.environ.get("OMNI_TPU_MASTER_PORT", "0")))
        remote_clients: list = []
        default_isolate = self._default_isolation(pipeline)
        for stage in pipeline.stages:
            args = dict(stage.engine_args)
            if stage.stage_type == "diffusion":
                from vllm_omni_tpu.diffusion import (DiffusionConfig,
                                                     DiffusionEngine)

                if args.get("model") is None:
                    args.pop("model", None)
                if args.pop("process_isolation", default_isolate):
                    # subprocess diffusion engine (reference
                    # StageDiffusionProc, stage_diffusion_proc.py:42)
                    from vllm_omni_tpu.engine.diffusion_proc import \
                        DiffusionProcClient
                    from vllm_omni_tpu.platforms import current_platform

                    engine = DiffusionProcClient(
                        args, platform="cpu"
                        if current_platform().is_cpu else None)
                    handle = _StageHandle(stage, engine, "diffusion")
                else:
                    dconf = DiffusionConfig(**args)
                    handle = _StageHandle(stage, DiffusionEngine(dconf),
                                          "diffusion")
            else:
                args.setdefault("model", default_model)
                if args.get("model") is None:
                    raise ValueError(f"stage {stage.stage_id} has no model")
                isolate = args.pop("process_isolation", default_isolate)
                placement = args.pop("placement", "local")
                if placement == "remote":
                    # stage runs on another host: publish its config via
                    # the master server and wait for a remote_stage
                    # worker to claim + handshake (reference
                    # OmniMasterServer, stage_engine_startup.py:102)
                    from vllm_omni_tpu.engine.stage_proc import \
                        RemoteStageClient
                    from vllm_omni_tpu.platforms import current_platform

                    engine = RemoteStageClient(
                        args, self.master, stage.stage_id,
                        platform="cpu" if current_platform().is_cpu
                        else None,
                        startup_timeout_s=float(
                            args.pop("startup_timeout_s", 600.0)),
                        defer_wait=True)
                    remote_clients.append(engine)
                    handle = _StageHandle(stage, engine, "llm")
                elif isolate:
                    # subprocess engine + ZMQ control/data plane
                    # (reference StageEngineCoreProc)
                    from vllm_omni_tpu.engine.stage_proc import \
                        StageProcClient
                    from vllm_omni_tpu.platforms import current_platform

                    engine = StageProcClient(
                        args,
                        platform="cpu" if current_platform().is_cpu
                        else None,
                        visible_devices=str(stage.runtime.devices)
                        if stage.runtime.devices not in ("all", None)
                        else None)
                    handle = _StageHandle(stage, engine, "llm")
                    if stage.stage_id == 0 and self.tokenizer is None:
                        # tokenization happens host-side in this process
                        # regardless of where the stage engine runs
                        self.tokenizer = get_tokenizer(
                            args.get("tokenizer") or args["model"],
                            args.get("trust_remote_code", False))
                else:
                    config = EngineConfig.from_kwargs(**args)
                    tok = get_tokenizer(config.model.tokenizer or
                                        config.model.model,
                                        config.model.trust_remote_code)
                    engine = EngineCore(config, tokenizer=tok)
                    handle = _StageHandle(stage, engine, "llm")
                    if stage.stage_id == 0 and tok is not None:
                        self.tokenizer = tok
            self.handles[stage.stage_id] = handle
            proc = stage.resolve_input_processor()
            self.processors[stage.stage_id] = proc or default_process_input
        for rc in remote_clients:  # all registered → workers connect in
            rc.wait_handshake()    # parallel; now block for readiness
        from vllm_omni_tpu.metrics import OrchestratorAggregator

        self.stats = OrchestratorAggregator()
        self._active: dict[str, PipelineRequest] = {}
        self._ctx: dict[str, Any] = {}
        # streaming hook: called (from the stepping thread) with every
        # non-final-tick output of a final stage (token deltas, audio
        # chunks) — AsyncOmni fans these into per-request queues
        self.on_stream: Optional[Callable[[RequestOutput], None]] = None

    @property
    def engines(self) -> dict[int, Any]:
        return {sid: h.engine for sid, h in self.handles.items()}

    # -- submission ---------------------------------------------------------
    def submit(self, prompt_token_ids: list[int],
               sampling_params: Optional[SamplingParams], request_id: str,
               modality: str = "text",
               diffusion_params: Any = None,
               prompt: Any = None, **kwargs: Any) -> None:
        # sampling_params None = "use the stage's default_sampling_params"
        # — an explicit SamplingParams() would OVERRIDE stage defaults
        # with the global defaults (temperature 1.0 etc.)
        user_provided = sampling_params is not None
        sampling_params = sampling_params or SamplingParams()
        preq = PipelineRequest(request_id=request_id, modality=modality,
                               sampling_params=sampling_params)
        preq.user_params = user_provided
        preq.diffusion_params = diffusion_params
        self._active[request_id] = preq
        self.stats.on_request_start(request_id)
        src_stages = [s for s in self.pipeline.stages
                      if not s.engine_input_source]
        for stage in src_stages:
            preq.dispatched_stages.add(stage.stage_id)
            preq.stage_start[stage.stage_id] = time.monotonic()
            self._maybe_submit_cfg_companion(stage, preq,
                                             prompt_token_ids)
            if stage.stage_type == "diffusion":
                payload: dict[str, Any] = {
                    "prompt": prompt if prompt is not None else "",
                    "diffusion_params": self._diffusion_params(stage, preq),
                }
                payload.update(kwargs)
            else:
                sp = self._stage_params(stage, sampling_params,
                                        user_stage0=user_provided)
                payload = {"prompt_token_ids": list(prompt_token_ids),
                           "sampling_params": sp, **kwargs}
            self.handles[stage.stage_id].add(request_id, payload)

    def _stage_params(self, stage: StageConfig, user: SamplingParams,
                      user_stage0: bool) -> SamplingParams:
        if user_stage0 and not stage.default_sampling_params:
            sp = user
        else:
            base = dict(stage.default_sampling_params)
            if user_stage0:
                merged = {**base}
                sp = SamplingParams(**{**merged,
                                       **_params_dict(user)})
            else:
                sp = SamplingParams(**base)
        # stages feeding another stage must emit hidden states
        if self.pipeline.consumers_of(stage.stage_id):
            sp = _with_hidden(sp)
        return sp

    def _maybe_submit_cfg_companion(self, stage: StageConfig,
                                     preq: PipelineRequest,
                                     prompt_token_ids) -> None:
        """Cross-stage CFG (reference architecture_overview.md:101-106
        + cfg_companion_tracker.py): when an AR stage conditions a
        CFG-enabled diffusion stage, run the NEGATIVE prompt through the
        same encoder as a companion request; both branches' hidden
        states reach the DiT as cond/uncond text_states."""
        if stage.stage_type != "llm":
            return
        consumers = [c for c in self.pipeline.consumers_of(stage.stage_id)
                     if c.stage_type == "diffusion"]
        if not consumers:
            return
        dp = preq.diffusion_params
        use_cfg = (dp is not None and dp.use_cfg) or any(
            (c.default_sampling_params or {}).get("guidance_scale", 1.0)
            > 1.0 for c in consumers)
        if not use_cfg:
            return
        neg_tokens = None
        if dp is not None:
            neg_tokens = dp.extra_args.get("negative_prompt_token_ids")
            if neg_tokens is None and dp.negative_prompt and \
                    self.tokenizer is not None:
                neg_tokens = self.tokenizer.encode(dp.negative_prompt)
        if not neg_tokens:
            return  # diffusion stage falls back to its own neg embedding
        sid = stage.stage_id
        sp = self._stage_params(stage, preq.sampling_params,
                                user_stage0=False)
        preq.companion_pending.add(sid)
        self.handles[sid].engine.add_request(
            list(neg_tokens), sp,
            request_id=f"{preq.request_id}#cfg-neg{sid}")

    def _diffusion_params(self, stage: StageConfig, preq: PipelineRequest):
        from vllm_omni_tpu.core.sampling_params import \
            DiffusionSamplingParams

        if preq.diffusion_params is not None:
            return preq.diffusion_params
        return DiffusionSamplingParams(**stage.default_sampling_params)

    # -- stepping -----------------------------------------------------------
    def step(self) -> list[RequestOutput]:
        """One cooperative tick over all stage engines; returns finished
        FINAL outputs."""
        finals: list[RequestOutput] = []
        for stage in self.pipeline.stages:
            handle = self.handles[stage.stage_id]
            if not handle.has_unfinished():
                continue
            for out in handle.step():
                if "#cfg-neg" in out.request_id:
                    if out.finished:
                        self._route_companion(stage, out)
                    continue
                if out.finished:
                    finals.extend(self._route(stage, out))
                    continue
                # mid-flight output: async_chunk forwarding + streaming
                self._forward_chunks(stage, out, final=False)
                if self.on_stream is not None:
                    preq = self._active.get(out.request_id)
                    if preq is not None and stage.stage_id == \
                            self.pipeline.final_stage_for(
                                preq.modality).stage_id:
                        out.stage_id = stage.stage_id
                        out.final_output_type = stage.final_output_type
                        self.on_stream(out)
        return finals

    def _route_companion(self, stage: StageConfig,
                         out: RequestOutput) -> None:
        parent_rid = out.request_id.split("#cfg-neg")[0]
        preq = self._active.get(parent_rid)
        if preq is None:
            return
        preq.companion_outputs[stage.stage_id] = out
        preq.companion_pending.discard(stage.stage_id)
        # the consumer may have been waiting only on the companion
        fake_parent = preq.stage_outputs.get(stage.stage_id)
        if fake_parent is not None:
            self._route(stage, fake_parent)

    def _forward_chunks(self, stage: StageConfig, out: RequestOutput,
                        final: bool) -> None:
        """Stream the producer's NEW output tokens into async_chunk
        consumers in chunk_frames-sized pieces (reference: async_chunk
        design — talker→code2wav streams 25-frame codec chunks while the
        talker is still decoding, docs async_chunk_design.md:28-33).
        The consumer request is resumable; its prefill overlaps the
        producer's decode."""
        preq = self._active.get(out.request_id)
        if preq is None or not out.outputs:
            return
        toks = out.outputs[0].token_ids
        for consumer in self.pipeline.consumers_of(stage.stage_id):
            if not consumer.async_chunk:
                continue
            sid = consumer.stage_id
            sent = preq.chunk_sent.get(sid, 0)
            cf0 = max(1, consumer.chunk_frames)
            cf_max = consumer.chunk_frames_max or 4 * cf0
            growth = max(1.0, consumer.chunk_frames_growth)
            if len(self._active) > 2:
                # under concurrency the consumer amortizes per-chunk
                # cost by batching ACROSS requests — growing chunks
                # just pads its prefill batches (measured: c=10 TTS
                # e2e +20% with growth on); keep the reference's fixed
                # chunk_frames and let continuous batching do the work
                growth = 1.0
            cf = preq.chunk_size.get(sid, cf0)
            while len(toks) - sent >= cf or (final and len(toks) > sent):
                chunk = toks[sent:sent + cf]
                sent += len(chunk)
                is_last = final and sent >= len(toks)
                self._deliver_chunk(consumer, preq, out.request_id,
                                    chunk, is_last)
                # the FIRST chunk stays small (it bounds TTFP); later
                # chunks grow to amortize per-chunk dispatch + prefill
                if growth > 1.0:
                    cf = min(max(int(cf * growth), cf + 1), cf_max)
                    preq.chunk_size[sid] = cf
            if final and sid in preq.chunk_started and \
                    preq.chunk_sent.get(sid, 0) == sent:
                # no remainder: deliver the bare final marker
                self.handles[sid].engine.notify_chunk(
                    preq.request_id, [], final=True)
            preq.chunk_sent[sid] = sent

    def _deliver_chunk(self, consumer: StageConfig, preq: PipelineRequest,
                       request_id: str, chunk: list[int],
                       final: bool) -> None:
        sid = consumer.stage_id
        engine = self.handles[sid].engine
        if sid not in preq.chunk_started:
            sp = self._stage_params(consumer, preq.sampling_params,
                                    user_stage0=False)
            preq.chunk_started.add(sid)
            preq.dispatched_stages.add(sid)
            preq.stage_start[sid] = time.monotonic()
            engine.add_request(list(chunk), sp, request_id=request_id,
                               resumable=True)
            if final:
                engine.notify_chunk(request_id, [], final=True)
            return
        engine.notify_chunk(request_id, list(chunk), final=final)

    def has_unfinished(self) -> bool:
        return any(h.has_unfinished() for h in self.handles.values()) or \
            any(p.final_output is None for p in self._active.values())

    def _route(self, stage: StageConfig,
               out: RequestOutput) -> list[RequestOutput]:
        preq = self._active.get(out.request_id)
        if preq is None:
            return []
        sid = stage.stage_id
        out.stage_id = sid
        preq.stage_outputs[sid] = out
        t0 = preq.stage_start.get(sid)
        if t0 is not None:
            preq.stage_durations[f"stage{sid}"] = time.monotonic() - t0
        finals: list[RequestOutput] = []
        # async_chunk consumers: flush remaining tokens + final marker
        self._forward_chunks(stage, out, final=True)
        # forward to consumers whose sources are all ready
        for consumer in self.pipeline.consumers_of(sid):
            if consumer.async_chunk or \
                    consumer.stage_id in preq.dispatched_stages:
                continue
            if not all(s in preq.stage_outputs
                       for s in consumer.engine_input_source):
                continue
            if consumer.stage_type == "diffusion" and any(
                    s in preq.companion_pending
                    for s in consumer.engine_input_source):
                continue  # wait for the negative branch
            ctx = dict(self._ctx)
            ctx["companions"] = preq.companion_outputs
            payload = self.processors[consumer.stage_id](
                preq.stage_outputs, consumer, ctx)
            if consumer.stage_type == "diffusion":
                payload.setdefault("diffusion_params",
                                   self._diffusion_params(consumer, preq))
            elif payload.get("sampling_params") is None:
                payload["sampling_params"] = self._stage_params(
                    consumer, preq.sampling_params, user_stage0=False)
            preq.dispatched_stages.add(consumer.stage_id)
            preq.stage_start[consumer.stage_id] = time.monotonic()
            self.handles[consumer.stage_id].add(out.request_id, payload)
        # final output?
        self.stats.on_stage_output(
            sid, out.request_id,
            num_new_tokens=len(out.outputs[0].token_ids)
            if out.outputs else 0, finished=True)
        final_stage = self.pipeline.final_stage_for(preq.modality)
        if sid == final_stage.stage_id and preq.final_output is None:
            out.final_output_type = stage.final_output_type
            out.stage_durations = dict(preq.stage_durations)
            post = stage.resolve_output_processor()
            if post is not None:
                post(out)
            preq.final_output = out
            self.stats.on_request_finish(out.request_id, out)
            finals.append(out)
        return finals

    def collective_rpc(self, method: str, *args: Any,
                       stage_ids: Optional[list[int]] = None,
                       **kwargs: Any) -> dict[int, Any]:
        """Invoke `method` on every stage engine (or the given subset) —
        sleep/wake_up/reload_weights/profiling control (reference:
        AsyncOmni.collective_rpc async_omni.py:502). Returns per-stage
        results; stages lacking the method report None."""
        results: dict[int, Any] = {}
        for sid, handle in self.handles.items():
            if stage_ids is not None and sid not in stage_ids:
                continue
            fn = getattr(handle.engine, method, None)
            results[sid] = fn(*args, **kwargs) if callable(fn) else None
        return results

    def feed_input(self, request_id: str, token_ids: list[int],
                   final: bool = False) -> None:
        """Streaming input: append a prompt chunk to a resumable request
        on the source stage(s) (reference: AsyncOmni
        _add_streaming_input_request async_omni.py:279 — live TTS text)."""
        for stage in self.pipeline.stages:
            if not stage.engine_input_source:
                self.handles[stage.stage_id].engine.notify_chunk(
                    request_id, list(token_ids), final=final)

    def shutdown(self) -> None:
        for h in self.handles.values():
            if hasattr(h.engine, "shutdown"):
                h.engine.shutdown()

    def abort(self, request_id: str) -> bool:
        """Abort across all stages (reference: orchestrator abort fan-out
        orchestrator.py:247-260)."""
        preq = self._active.pop(request_id, None)
        hit = False
        for handle in self.handles.values():
            if handle.engine.abort_request(request_id):
                hit = True
        return hit or preq is not None

    # -- offline convenience -------------------------------------------------
    def generate(self, prompts: list, params_list: list,
                 modality: str = "text") -> list[RequestOutput]:
        from vllm_omni_tpu.core.sampling_params import \
            DiffusionSamplingParams
        from vllm_omni_tpu.utils import random_uuid

        src_is_diffusion = all(
            s.stage_type == "diffusion" for s in self.pipeline.stages
            if not s.engine_input_source)
        order = []
        for prompt, sp in zip(prompts, params_list):
            rid = random_uuid()
            order.append(rid)
            if src_is_diffusion:
                dp = sp if isinstance(sp, DiffusionSamplingParams) else None
                self.submit([], None, rid, modality=modality,
                            diffusion_params=dp, prompt=prompt)
                continue
            token_ids = self._tokenize(prompt)
            dp = None
            if not isinstance(sp, SamplingParams):
                dp, sp = (sp, None) if sp is not None else (None, None)
            kwargs = {}
            if isinstance(prompt, dict) and prompt.get("mm_inputs"):
                kwargs["mm_inputs"] = prompt["mm_inputs"]
            self.submit(token_ids, sp, rid, modality=modality,
                        diffusion_params=dp, **kwargs)
        ticks = 0
        while self.has_unfinished():
            if not self.step():
                time.sleep(0.0005)  # idle tick (proc stages poll async)
            ticks += 1
            if ticks > 1_000_000:
                raise RuntimeError("pipeline stalled")
        outs = [self._active[rid].final_output for rid in order]
        for rid in order:
            del self._active[rid]
        return outs

    def _tokenize(self, prompt) -> list[int]:
        if isinstance(prompt, dict):
            if "prompt_token_ids" in prompt:
                return list(prompt["prompt_token_ids"])
            prompt = prompt.get("prompt", "")
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("no tokenizer; pass prompt_token_ids")
            return self.tokenizer.encode(prompt)
        return list(prompt)


def _params_dict(p: SamplingParams) -> dict[str, Any]:
    from dataclasses import asdict

    return asdict(p)


def _with_hidden(p: SamplingParams) -> SamplingParams:
    d = _params_dict(p)
    d["return_hidden_states"] = True
    return SamplingParams(**d)
