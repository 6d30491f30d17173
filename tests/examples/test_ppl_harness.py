"""Smoke tier for benchmarks/ppl_harness.py (the quantization-quality
instrument behind PPL_rNN.json): train a few steps, save through
transformers, load through OUR loader, and run every eval mode."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "benchmarks"))


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import ppl_harness

    path = str(tmp_path_factory.mktemp("pplck") / "ckpt")
    ppl_harness.train(path, steps=30)
    return path


def test_corpus_entropy_floor():
    import ppl_harness

    # the chain's irreducible ppl must keep the instrument unsaturated
    assert np.exp(ppl_harness.chain_entropy()) > 5.0
    c = ppl_harness.make_corpus(2000, seed=1)
    assert c.min() >= 0 and c.max() < ppl_harness.VOCAB
    # successor structure: each token has at most BRANCH successors
    succ = {}
    for a, b in zip(c[:-1], c[1:]):
        succ.setdefault(int(a), set()).add(int(b))
    assert max(len(s) for s in succ.values()) <= ppl_harness.BRANCH


def test_eval_modes_run_and_agree_roughly(tiny_ckpt):
    import ppl_harness

    held = ppl_harness.make_corpus(2 * (ppl_harness.SEQ_LEN + 1), seed=5)
    base = ppl_harness.eval_weight_quant(tiny_ckpt, None, held)
    assert np.isfinite(base) and base > 1.0
    int8 = ppl_harness.eval_weight_quant(tiny_ckpt, "int8", held)
    kv8 = ppl_harness.eval_kv_quant(tiny_ckpt, "int8", held)
    kvf = ppl_harness.eval_kv_quant(tiny_ckpt, "fp8", held)
    # a 30-step model is noisy; quantized evals must stay in the same
    # ballpark as base (mechanics check, not a quality gate)
    for v in (int8, kv8, kvf):
        assert np.isfinite(v) and abs(v - base) / base < 0.5
