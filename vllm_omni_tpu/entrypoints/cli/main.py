"""`vllm-omni-tpu` console entrypoint.

Reference parity: entrypoints/cli/main.py:9 + serve.py:80
(`vllm serve <model> --omni`). Subcommands: serve, generate (offline
smoke), bench (decode throughput).
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", help="model path or 'dummy'")
    p.add_argument("--stage-configs-path", default=None,
                   help="pipeline YAML (multi-stage)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quantization", default=None,
                   choices=["int8", "int4", "fp8"])
    p.add_argument("--kv-cache-dtype", default="auto")
    p.add_argument("--max-model-len", type=int, default=4096)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)


def _engine_kwargs(args: argparse.Namespace) -> dict:
    return dict(dtype=args.dtype, quantization=args.quantization,
                kv_cache_dtype=args.kv_cache_dtype,
                max_model_len=args.max_model_len,
                max_num_seqs=args.max_num_seqs,
                tensor_parallel_size=args.tensor_parallel_size)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="vllm-omni-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    serve = sub.add_parser("serve", help="OpenAI-compatible API server")
    _add_engine_args(serve)
    serve.add_argument("--host", default="0.0.0.0")
    serve.add_argument("--port", type=int, default=8000)

    gen = sub.add_parser("generate", help="offline generation smoke")
    _add_engine_args(gen)
    gen.add_argument("--prompt", default="Hello")
    gen.add_argument("--max-tokens", type=int, default=32)

    bench = sub.add_parser(
        "bench", help="serving benchmark (reference `vllm bench serve`): "
        "TTFT/TPOT/ITL/TTFP/RTF/E2E → stats.jsonl")
    bench.add_argument("--pipeline", default="tts",
                       choices=["llm", "tts", "t2i"])
    bench.add_argument("--stage-configs-path", default=None)
    bench.add_argument("--num-requests", type=int, default=8)
    bench.add_argument("--concurrency", type=int, default=4)
    bench.add_argument("--prompt-len", type=int, default=64)
    bench.add_argument("--max-tokens", type=int, default=100)
    bench.add_argument("--http", action="store_true",
                       help="spawn the server and bench over HTTP")
    bench.add_argument("--out", default="/tmp/omni_bench")

    args = parser.parse_args(argv)

    if args.cmd == "bench":
        import os

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))),
            "benchmarks"))
        import serve_bench

        serve_bench.main(args)
        return 0

    if args.cmd == "serve":
        from vllm_omni_tpu.entrypoints.openai.api_server import run_server

        run_server(args.model, stage_configs=args.stage_configs_path,
                   host=args.host, port=args.port, **_engine_kwargs(args))
        return 0

    if args.cmd == "generate":
        from vllm_omni_tpu import Omni, SamplingParams

        omni = Omni(args.model, stage_configs=args.stage_configs_path,
                    **_engine_kwargs(args))
        outs = omni.generate([args.prompt],
                             SamplingParams(max_tokens=args.max_tokens))
        for o in outs:
            print(json.dumps({
                "request_id": o.request_id,
                "text": o.outputs[0].text,
                "token_ids": o.outputs[0].token_ids,
                "metrics": o.metrics,
            }))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
