"""Remote stage worker entrypoint (multi-node stage startup).

Run on a worker host:

    python -m vllm_omni_tpu.engine.remote_stage \
        --master tcp://ORCHESTRATOR_HOST:PORT [--stage-id N]

Claims a stage from the orchestrator's `OmniMasterServer`, builds the
engine locally (own JAX runtime / chips), connects back to the
pre-bound ZMQ control/output endpoints, and serves the standard stage
busy loop (reference: run_stage_core, stage_engine_core_proc.py:50 +
register_stage_with_omni_master, stage_engine_startup.py).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True,
                    help="tcp://host:port of the OmniMasterServer")
    ap.add_argument("--stage-id", type=int, default=None,
                    help="claim a specific stage (default: any)")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu for tests)")
    ap.add_argument("--timeout", type=float, default=120.0,
                    help="seconds to wait for an assignment")
    args = ap.parse_args()

    from vllm_omni_tpu.engine.master import fetch_assignment, notify_ready
    from vllm_omni_tpu.engine.stage_proc import _stage_proc_main

    stage_id, spec = fetch_assignment(args.master, args.stage_id,
                                      timeout_s=args.timeout)
    platform = args.platform or spec.get("platform")
    _stage_proc_main(
        spec["engine_kwargs"], spec["ctrl_addr"], spec["out_addr"],
        platform, spec.get("visible_devices"),
        on_ready=lambda: notify_ready(args.master, stage_id))


if __name__ == "__main__":
    main()
