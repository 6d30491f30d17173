"""Coordinator registry/heartbeat/LB tests (reference:
tests/distributed/omni_coordinator/test_omni_coordinator.py — in-proc ZMQ
endpoints)."""

import time

import pytest

import vllm_omni_tpu.distributed.coordinator as coord_mod
from vllm_omni_tpu.distributed.coordinator import (Coordinator, HubClient,
                                                   StageCoordClient)


@pytest.fixture
def coordinator():
    c = Coordinator()
    yield c
    c.close()


def test_register_list_pick(coordinator):
    hub = HubClient(coordinator.addr)
    a = StageCoordClient(coordinator.addr, "engine-a", stage_id=0,
                         queue_len_fn=lambda: 5)
    b = StageCoordClient(coordinator.addr, "engine-b", stage_id=0,
                         queue_len_fn=lambda: 1)
    try:
        time.sleep(0.1)
        insts = hub.list_instances(stage_id=0)
        assert {i["instance_id"] for i in insts} == {"engine-a",
                                                     "engine-b"}
        # queue lengths arrive with heartbeats
        deadline = time.time() + 6
        while time.time() < deadline:
            pick = hub.pick(stage_id=0)
            if pick and pick["queue_len"] == 1:
                break
            time.sleep(0.2)
        assert hub.pick(stage_id=0)["instance_id"] == "engine-b"
    finally:
        a.close()
        b.close()
        hub.close()


def test_deregister(coordinator):
    hub = HubClient(coordinator.addr)
    a = StageCoordClient(coordinator.addr, "engine-x")
    time.sleep(0.1)
    assert hub.list_instances()
    a.close()
    time.sleep(0.1)
    assert not hub.list_instances()
    hub.close()


def test_heartbeat_timeout_marks_error(coordinator, monkeypatch):
    monkeypatch.setattr(coord_mod, "HEARTBEAT_TIMEOUT_S", 0.5)
    hub = HubClient(coordinator.addr)
    a = StageCoordClient(coordinator.addr, "engine-dead")
    # kill the heartbeat thread without deregistering (simulated crash)
    a._stop.set()
    a._thread.join(timeout=3)
    deadline = time.time() + 5
    while time.time() < deadline:
        if not hub.list_instances():
            break
        time.sleep(0.2)
    assert not hub.list_instances(), "dead instance still listed"
    a.sock.close(0)
    hub.close()
