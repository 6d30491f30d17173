from vllm_omni_tpu.config.engine import CacheConfig, SchedulerConfig
from vllm_omni_tpu.core.request import Request, RequestStatus
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.core.scheduler import Scheduler


def make_sched(max_seqs=4, max_tokens=32, num_pages=64, page_size=4,
               mode="ar"):
    return Scheduler(
        SchedulerConfig(max_num_seqs=max_seqs,
                        max_num_batched_tokens=max_tokens, mode=mode),
        CacheConfig(page_size=page_size), num_pages=num_pages)


def req(rid, n_prompt=8, max_tokens=4, **kw):
    return Request(request_id=rid, prompt_token_ids=list(range(n_prompt)),
                   sampling_params=SamplingParams(max_tokens=max_tokens),
                   **kw)


def test_prefill_then_decode():
    s = make_sched()
    r = req("a", n_prompt=8)
    s.add_request(r)
    out = s.schedule()
    assert len(out.prefills) == 1 and out.prefills[0].length == 8
    s.complete_prefill(out.prefills[0])
    assert r in s.running
    out2 = s.schedule()
    assert out2.decodes == [r] and not out2.prefills


def test_chunked_prefill():
    s = make_sched(max_tokens=8)
    r = req("a", n_prompt=20)
    s.add_request(r)
    chunks = []
    while True:
        out = s.schedule()
        if not out.prefills:
            break
        assert out.prefills[0].length <= 8
        chunks.append(out.prefills[0].length)
        s.complete_prefill(out.prefills[0])
    assert sum(chunks) == 20
    assert chunks == [8, 8, 4]
    assert r in s.running


def test_multi_request_packing():
    s = make_sched(max_tokens=32)
    for i in range(3):
        s.add_request(req(f"r{i}", n_prompt=8))
    out = s.schedule()
    assert len(out.prefills) == 3  # all packed into one 24-token step
    for p in out.prefills:
        s.complete_prefill(p)
    out2 = s.schedule()
    assert len(out2.decodes) == 3


def test_decode_batch_cap():
    s = make_sched(max_seqs=2)
    for i in range(4):
        s.add_request(req(f"r{i}"))
    out = s.schedule()
    assert len(out.prefills) == 2  # max_num_seqs admission cap


def test_generation_mode_one_shot():
    s = make_sched(mode="generation")
    r = req("g", n_prompt=10)
    s.add_request(r)
    out = s.schedule()
    s.complete_prefill(out.prefills[0])
    # generation mode: request does NOT join the decode loop
    assert r not in s.running


def test_preemption_on_oom():
    # 8 pages total (1 reserved → 7 usable), page_size 4
    s = make_sched(max_seqs=4, num_pages=8, page_size=4, max_tokens=64)
    r1 = req("r1", n_prompt=12)  # 3 pages
    r2 = req("r2", n_prompt=12)  # 3 pages
    s.add_request(r1)
    s.add_request(r2)
    out = s.schedule()
    for p in out.prefills:
        s.complete_prefill(p)
    assert len(s.running) == 2
    # decode: r1 needs a 4th page (token 13) → only 1 free page left; after
    # r1 takes it r2 also needs one → preempts
    for _ in range(6):
        out = s.schedule()
        for r in out.decodes:
            r.append_output_token(1)
        if out.preempted:
            break
    assert any(x.status == RequestStatus.PREEMPTED for x in [r1, r2])


def test_async_chunk_flow():
    s = make_sched()
    r = req("c", n_prompt=4, resumable=True)
    s.add_request(r)
    out = s.schedule()
    s.complete_prefill(out.prefills[0])
    # resumable + prompt consumed → parked
    assert r.request_id in s.waiting_for_chunk
    assert s.schedule().is_empty
    s.notify_chunk("c", [7, 8, 9], final=True)
    out = s.schedule()
    assert out.prefills and out.prefills[0].length == 3
    s.complete_prefill(out.prefills[0])
    assert r in s.running  # final chunk → decodes now


def test_abort_and_transfer_pinning():
    s = make_sched()
    r = req("a")
    s.add_request(r)
    out = s.schedule()
    s.complete_prefill(out.prefills[0])
    pages = list(r.page_ids)
    free_before = s.block_manager.num_free_pages
    s.finish_request(r, RequestStatus.FINISHED_STOPPED,
                     pin_for_transfer=True)
    assert s.block_manager.num_free_pages == free_before  # pinned
    s.release_transfer("a")
    assert s.block_manager.num_free_pages == free_before + len(pages)


def test_preempted_victim_not_decoded_same_step():
    """ADVICE r1 (high): a request preempted mid-decode-loop must not be
    scheduled for decode in the SAME step (its pages were freed; decoding
    it would read uninitialized KV while it sits in `waiting`)."""
    s = make_sched(max_seqs=4, num_pages=8, page_size=4, max_tokens=64)
    r1 = req("r1", n_prompt=12, max_tokens=32)
    r2 = req("r2", n_prompt=12, max_tokens=32)
    s.add_request(r1)
    s.add_request(r2)
    out = s.schedule()
    for p in out.prefills:
        s.complete_prefill(p)
    assert len(s.running) == 2
    saw_preempt = False
    for _ in range(10):
        out = s.schedule()
        if out.preempted:
            saw_preempt = True
            for victim in out.preempted:
                assert victim not in out.decodes
                assert not victim.page_ids  # fully freed, no fresh alloc
                assert victim.status == RequestStatus.PREEMPTED
        for r in out.decodes:
            # every decoded request still holds pages covering its tokens
            assert r in s.running
            assert r.page_ids
            r.append_output_token(1)
        if saw_preempt:
            break
    assert saw_preempt


def test_preemption_skips_already_scheduled_victims():
    """A request already in this step's decode list is not an eligible
    preemption victim (its device step is committed)."""
    s = make_sched(max_seqs=4, num_pages=10, page_size=4, max_tokens=64)
    rs = [req(f"r{i}", n_prompt=8, max_tokens=32) for i in range(3)]
    for r in rs:
        s.add_request(r)
    out = s.schedule()
    for p in out.prefills:
        s.complete_prefill(p)
    for _ in range(12):
        out = s.schedule()
        for victim in out.preempted:
            assert victim not in out.decodes
        for r in out.decodes:
            r.append_output_token(1)
        if not s.running and not s.waiting:
            break


def test_admission_watermark_blocks_under_page_pressure():
    """Anti-thrash: when free pages no longer exceed the running count,
    NEW prefills are not admitted (page-holders keep decoding — no
    preempt/recompute livelock); admission resumes once enough requests
    finish and free their pages."""
    s = make_sched(max_seqs=16, max_tokens=64, num_pages=20, page_size=4)
    running = []
    blocked = None
    for i in range(12):
        r = Request(request_id=f"r{i}",
                    prompt_token_ids=[i * 100 + j for j in range(8)],
                    sampling_params=SamplingParams(max_tokens=64))
        s.add_request(r)
        out = s.schedule()
        if out.prefills:
            assert out.prefills[0].request is r
            s.complete_prefill(out.prefills[0])
            running.append(r)
        else:
            blocked = r
            # page-holders keep decoding the same step — no livelock
            assert out.decodes
            break
    assert blocked is not None, "pool never filled"
    assert blocked in list(s.waiting)
    # repeated scheduling under pressure never admits the newcomer and
    # never preempts-to-admit (the round-1 thrash mode)
    for _ in range(3):
        out = s.schedule()
        assert not out.prefills
    # finishing requests frees pages -> the newcomer is admitted
    for r in list(s.running):
        s.finish_request(r, RequestStatus.FINISHED_STOPPED)
        out = s.schedule()
        if out.prefills:
            # preempted requests recover first (front of waiting), then
            # the blocked newcomer — either way admission resumed
            assert out.prefills[0].request.request_id in (
                blocked.request_id, "r6")
            break
    else:
        raise AssertionError("admission never resumed")
