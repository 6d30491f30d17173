"""Continuous-batching scheduler for AR and generation stages.

Reference parity: the reference forks vLLM's scheduler twice
(OmniARScheduler core/sched/omni_ar_scheduler.py:42 and
OmniGenerationScheduler omni_generation_scheduler.py:28). We use ONE
scheduler with a mode switch (SURVEY.md §7 "what we do differently"):

- mode="ar": chunked prefill + token-by-token decode with preemption.
- mode="generation": the whole prompt is fed in one shot and the request
  finishes at prefill end (vocoder/code2wav stages — reference
  omni_generation_scheduler.py:36 "feed all tokens at once").

TPU specifics: every step the scheduler emits is either a *prefill step*
(packed token chunks of one or more requests) or a *decode step* (one token
per running request). Each maps to a single bucketed, statically-shaped jit
program — the scheduler is pure host Python and never touches device data.

async_chunk: requests can enter WAITING_FOR_CHUNK (reference patch.py:103);
they are parked until `notify_chunk` wakes them.

KV-transfer-aware lifecycle: a finished request whose KV/hidden states are
still being extracted moves to WAITING_FOR_TRANSFER instead of freeing its
pages (reference omni_ar_scheduler.py:64-67); `release_transfer` completes
the free.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Optional, Sequence

from vllm_omni_tpu.config.engine import CacheConfig, SchedulerConfig
from vllm_omni_tpu.core.block_manager import BlockManager
from vllm_omni_tpu.core.request import Request, RequestStatus
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclass
class ScheduledPrefill:
    request: Request
    start: int  # offset into the prompt
    length: int  # chunk length (tokens to compute this step)


@dataclass
class SchedulerOutput:
    prefills: list[ScheduledPrefill] = field(default_factory=list)
    decodes: list[Request] = field(default_factory=list)
    preempted: list[Request] = field(default_factory=list)
    # chained decode steps granted this schedule (multi-step decode:
    # pages are pre-allocated for this many tokens per decode request)
    lookahead: int = 1
    # generation-mode requests whose whole prompt is already computed
    # (nothing left to run — engine emits their finish)
    completed_generation: list[Request] = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not self.prefills and not self.decodes

    @property
    def num_prefill_tokens(self) -> int:
        return sum(p.length for p in self.prefills)


class Scheduler:
    def __init__(self, scheduler_config: SchedulerConfig,
                 cache_config: CacheConfig, num_pages: int) -> None:
        self.config = scheduler_config
        self.cache_config = cache_config
        self.block_manager = BlockManager(
            num_pages=num_pages,
            page_size=cache_config.page_size,
            enable_prefix_caching=scheduler_config.enable_prefix_caching,
        )
        self.waiting: deque[Request] = deque()
        self.running: list[Request] = []
        # requests parked on async_chunk input
        self.waiting_for_chunk: dict[str, Request] = {}
        # finished but pages pinned until transfer completes
        self.waiting_for_transfer: dict[str, Request] = {}
        self._all: dict[str, Request] = {}

    # -- request lifecycle --------------------------------------------------
    def add_request(self, request: Request) -> None:
        if len(self.waiting) >= self.config.max_queue_len:
            raise RuntimeError("scheduler queue full")
        max_len = None  # model max len enforced by engine
        self._all[request.request_id] = request
        request.status = RequestStatus.WAITING
        self.waiting.append(request)

    def abort_request(self, request_id: str) -> Optional[Request]:
        req = self._all.get(request_id)
        if req is None or req.is_finished:
            return None
        self._finish(req, RequestStatus.FINISHED_ABORTED)
        return req

    def get_request(self, request_id: str) -> Optional[Request]:
        return self._all.get(request_id)

    def notify_chunk(self, request_id: str, token_ids: list[int],
                     final: bool = False) -> None:
        """async_chunk: a new input chunk arrived for a parked request."""
        req = self.waiting_for_chunk.pop(request_id, None)
        if req is None:
            req = self._all.get(request_id)
            if req is None:
                logger.warning("chunk for unknown request %s", request_id)
                return
        req.extend_prompt(token_ids)
        if final:
            req.resumable = False
        if req.status == RequestStatus.WAITING_FOR_CHUNK:
            req.status = RequestStatus.WAITING
            self.waiting.appendleft(req)  # resume promptly

    def release_transfer(self, request_id: str) -> None:
        req = self.waiting_for_transfer.pop(request_id, None)
        if req is not None:
            self.block_manager.free(req.page_ids)
            req.page_ids = []

    # -- core policy ---------------------------------------------------------
    def schedule(self, lookahead: int = 1) -> SchedulerOutput:
        out = SchedulerOutput(lookahead=lookahead)
        # 1. admit waiting requests into prefill while budget allows.
        #    Prefill-priority fills the decode batch quickly; chunked
        #    prefill caps per-step latency impact.
        budget = self.config.max_num_batched_tokens
        # Anti-thrash admission watermark: admitting a new prefill when
        # the running set is already near page capacity triggers a
        # preempt→recompute→preempt livelock (measured: bs=128 on a
        # 1638-page pool collapsed to half of bs=32's throughput).
        # Require one free page of decode headroom per running request
        # before admitting anyone new; mid-prompt chunked continuations
        # (num_computed_tokens > 0) are exempt — their pages are sunk.
        free = self.block_manager.num_free_pages
        headroom_ok = free > len(self.running)
        while (self.waiting and budget > 0
               and len(self.running) + len(out.prefills) <
               self.config.max_num_seqs):
            req = self.waiting[0]
            if not headroom_ok and req.num_computed_tokens == 0 and \
                    not req.page_ids:
                break
            remaining = req.num_prompt_tokens - req.num_computed_tokens
            if remaining <= 0:
                # resumable request waiting for more input
                if req.resumable:
                    self.waiting.popleft()
                    req.status = RequestStatus.WAITING_FOR_CHUNK
                    self.waiting_for_chunk[req.request_id] = req
                    continue
                self.waiting.popleft()
                if self.config.mode == "generation":
                    # one-shot stage fully computed (final chunk arrived
                    # after everything was already prefilled)
                    out.completed_generation.append(req)
                    continue
                self.running.append(req)
                req.status = RequestStatus.RUNNING
                continue
            chunk = min(remaining, budget)
            # allocate pages covering tokens [0, computed+chunk)
            target_tokens = req.num_computed_tokens + chunk
            if not req.page_ids:
                if not self.block_manager.can_allocate(target_tokens):
                    break  # no space; try again next step
                alloc = self.block_manager.allocate(
                    target_tokens, token_ids=req.prompt_token_ids)
                req.page_ids = alloc.page_ids
                # always recompute ≥1 prompt token so the step that
                # samples the first output token has fresh logits (vLLM
                # semantics; the overlapping KV write is value-identical)
                cached = min(alloc.num_cached_tokens,
                             req.num_prompt_tokens - 1)
                if cached > req.num_computed_tokens:
                    req.num_computed_tokens = cached
                    remaining = req.num_prompt_tokens - req.num_computed_tokens
                    chunk = min(remaining, budget)
                    target_tokens = req.num_computed_tokens + chunk
                    if chunk <= 0:
                        continue  # fully cached; loop will move to running
            else:
                try:
                    self.block_manager.extend(
                        req.page_ids, req.num_computed_tokens, target_tokens)
                except MemoryError:
                    break
            self.waiting.popleft()
            out.prefills.append(
                ScheduledPrefill(req, req.num_computed_tokens, chunk))
            budget -= chunk
            req.status = RequestStatus.RUNNING
            # chunked: if prompt not fully covered, request returns to the
            # FRONT of the waiting queue after this step (engine calls
            # `complete_prefill`), else joins running via complete_prefill.

        # 2. decode step for all running requests (`lookahead` tokens each
        #    — multi-step decode pre-allocates the whole chain's slots)
        if not out.prefills and self.running:
            decodes: list[Request] = []
            for req in list(self.running):
                if req not in self.running:
                    # preempted by an earlier iteration this step: its
                    # pages are freed and it sits in `waiting` for full
                    # recompute — decoding it now would read blank KV
                    continue
                # need slots for every token generated in this chain
                new_total = req.num_tokens + out.lookahead
                try:
                    self.block_manager.extend(req.page_ids, req.num_tokens,
                                              new_total)
                except MemoryError:
                    victim = self._preempt_lowest_priority(
                        exclude=req, scheduled=decodes)
                    if victim is None:
                        # cannot make room; skip this request this step
                        continue
                    out.preempted.append(victim)
                    try:
                        self.block_manager.extend(req.page_ids,
                                                  req.num_tokens, new_total)
                    except MemoryError:
                        continue
                decodes.append(req)
                if len(decodes) >= self.config.max_num_seqs:
                    break
            out.decodes = decodes
        return out

    def extend_for_async(self, reqs: list[Request],
                         total_ahead: int) -> bool:
        """Pre-allocate pages covering num_tokens + total_ahead for an
        async (pipelined) decode chain. All-or-nothing and NEVER
        preempts — speculative work must not evict committed requests.
        Returns False (leaving any partial extensions in place — they
        are reused or freed with the request) when pages run out."""
        try:
            for req in reqs:
                self.block_manager.extend(req.page_ids, req.num_tokens,
                                          req.num_tokens + total_ahead)
        except MemoryError:
            return False
        return True

    def complete_prefill(self, sched: ScheduledPrefill) -> None:
        """Engine callback after a prefill chunk executes."""
        req = sched.request
        req.num_computed_tokens += sched.length
        if req.num_computed_tokens >= req.num_prompt_tokens:
            if self.config.mode == "generation" and not req.resumable:
                # one-shot stage: finished at prefill end
                self.block_manager.register_prefix(req.page_ids,
                                                   req.prompt_token_ids)
                return  # engine will call finish_request
            if req.resumable and req.num_computed_tokens == \
                    req.num_prompt_tokens:
                # wait for more input chunks before decoding
                req.status = RequestStatus.WAITING_FOR_CHUNK
                self.waiting_for_chunk[req.request_id] = req
                self.block_manager.register_prefix(req.page_ids,
                                                   req.prompt_token_ids)
                return
            self.running.append(req)
            self.block_manager.register_prefix(req.page_ids,
                                               req.prompt_token_ids)
        else:
            # more chunks to go — front of queue keeps FIFO fairness
            req.status = RequestStatus.WAITING
            self.waiting.appendleft(req)

    def finish_request(self, req: Request, status: RequestStatus,
                       pin_for_transfer: bool = False) -> None:
        self._finish(req, status, pin_for_transfer)

    def _finish(self, req: Request, status: RequestStatus,
                pin_for_transfer: bool = False) -> None:
        req.status = status
        import time as _t
        req.finish_time = _t.monotonic()
        if req in self.running:
            self.running.remove(req)
        try:
            self.waiting.remove(req)
        except ValueError:
            pass
        self.waiting_for_chunk.pop(req.request_id, None)
        if pin_for_transfer:
            self.waiting_for_transfer[req.request_id] = req
        elif req.page_ids:
            self.block_manager.free(req.page_ids)
            req.page_ids = []

    def _preempt_lowest_priority(
            self, exclude: Request,
            scheduled: Sequence[Request] = ()) -> Optional[Request]:
        """Preempt the most recently arrived running request: free its
        pages, reset computed tokens, push back to waiting (recompute).

        Requests already scheduled for this step (`scheduled`) are not
        eligible victims — their decode is committed; preempting one
        would free pages the imminent device step still writes to."""
        sched_ids = {id(r) for r in scheduled}
        candidates = [r for r in self.running
                      if r is not exclude and id(r) not in sched_ids]
        if not candidates:
            return None
        victim = max(candidates, key=lambda r: r.arrival_time)
        self.running.remove(victim)
        self.block_manager.free(victim.page_ids)
        victim.page_ids = []
        # recompute the whole sequence (prompt + generated so far)
        victim.prompt_token_ids = victim.all_token_ids()
        victim.output_token_ids = []
        victim.num_computed_tokens = 0
        victim.status = RequestStatus.PREEMPTED
        self.waiting.appendleft(victim)
        logger.warning("preempted request %s (out of KV pages)",
                       victim.request_id)
        return victim

    # -- introspection -------------------------------------------------------
    @property
    def num_unfinished(self) -> int:
        return (len(self.waiting) + len(self.running) +
                len(self.waiting_for_chunk))

    def has_unfinished(self) -> bool:
        return self.num_unfinished > 0
