"""Dynin-Omni masked-discrete-diffusion family tests.

The torch oracle independently re-implements the bidirectional tower
and the masked-diffusion samplers whose names the reference dispatches
on (dynin_omni_token2text.py TASK_TO_GENERATE_FN:61-76): LLaDA-style
block low-confidence remasking, Fast-dLLM threshold parallel decode,
and MaskGIT cosine parallel decode over vocab slices. temperature=0
makes every loop deterministic, so parity is exact-token."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.models.dynin_omni import (  # noqa: E402
    DyninConfig, DyninOmni, build_dynin_prompt, dynin_forward,
    is_dynin_config, load_dynin, maskgit_generate, mmu_generate,
    mmu_generate_fastdllm_v1, num_transfer_tokens, t2i_generate,
    t2s_generate)

HS, NH, NKV, HD, IM = 32, 4, 2, 8, 64
TV, IC, AC = 64, 16, 12   # text vocab / image codebook / audio codebook
MASK, SOI, EOI, SOA, EOA, EOT = 50, 51, 52, 53, 54, 55
HF = {
    "model_type": "dynin_omni",
    "architectures": ["DyninOmniForCausalLM"],
    "hidden_size": HS, "intermediate_size": IM,
    "num_hidden_layers": 2, "num_attention_heads": NH,
    "num_key_value_heads": NKV, "rope_theta": 10000.0,
    "rms_norm_eps": 1e-5, "qk_norm": True,
    "text_vocab_size": TV, "image_codebook_size": IC,
    "audio_codebook_size": AC, "mask_token_id": MASK,
    "soi_token_id": SOI, "eoi_token_id": EOI,
    "soa_token_id": SOA, "eoa_token_id": EOA, "eot_token_id": EOT,
    "image_grid": 3, "t2s_token_length": 6,
}
V = TV + IC + AC


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {"model.embed_tokens.weight": torch.randn(V, HS,
                                                   generator=g) * 0.02,
          "lm_head.weight": torch.randn(V, HS, generator=g) * 0.1,
          "model.norm.weight": torch.rand(HS, generator=g) + 0.5}

    def put(prefix, o, i):
        sd[f"{prefix}.weight"] = torch.randn(o, i, generator=g) * \
            (i ** -0.5)

    for li in range(2):
        p = f"model.layers.{li}"
        put(f"{p}.self_attn.q_proj", NH * HD, HS)
        put(f"{p}.self_attn.k_proj", NKV * HD, HS)
        put(f"{p}.self_attn.v_proj", NKV * HD, HS)
        put(f"{p}.self_attn.o_proj", HS, NH * HD)
        sd[f"{p}.self_attn.q_norm.weight"] = torch.rand(
            HD, generator=g) + 0.5
        sd[f"{p}.self_attn.k_norm.weight"] = torch.rand(
            HD, generator=g) + 0.5
        put(f"{p}.mlp.gate_proj", IM, HS)
        put(f"{p}.mlp.up_proj", IM, HS)
        put(f"{p}.mlp.down_proj", HS, IM)
        sd[f"{p}.input_layernorm.weight"] = torch.rand(
            HS, generator=g) + 0.5
        sd[f"{p}.post_attention_layernorm.weight"] = torch.rand(
            HS, generator=g) + 0.5
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("dynin_tiny")
    with open(root / "config.json", "w") as f:
        json.dump(HF, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def _o_rms(x, w, eps=1e-5):
    var = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(var + eps)) * w.float()


def _o_forward(sd, ids):
    t = len(ids)
    x = sd["model.embed_tokens.weight"][ids].float()
    inv = 1.0 / (10000.0 ** (torch.arange(0, HD, 2).double() / HD))
    ang = torch.arange(t).double()[:, None] * inv[None]
    emb = torch.cat([ang, ang], dim=-1)
    cos, sin = emb.cos().float(), emb.sin().float()

    def rope(v):
        half = v.shape[-1] // 2
        rot = torch.cat([-v[..., half:], v[..., :half]], dim=-1)
        return v * cos[:, None] + rot * sin[:, None]

    for li in range(2):
        p = f"model.layers.{li}"
        h = _o_rms(x, sd[f"{p}.input_layernorm.weight"])
        q = (h @ sd[f"{p}.self_attn.q_proj.weight"].T.float()
             ).reshape(t, NH, HD)
        k = (h @ sd[f"{p}.self_attn.k_proj.weight"].T.float()
             ).reshape(t, NKV, HD)
        v = (h @ sd[f"{p}.self_attn.v_proj.weight"].T.float()
             ).reshape(t, NKV, HD)
        q = _o_rms(q, sd[f"{p}.self_attn.q_norm.weight"])
        k = _o_rms(k, sd[f"{p}.self_attn.k_norm.weight"])
        q, k = rope(q), rope(k)
        kr = k.repeat_interleave(NH // NKV, dim=1)
        vr = v.repeat_interleave(NH // NKV, dim=1)
        sc = torch.einsum("qhd,khd->hqk", q, kr) * (HD ** -0.5)
        o = torch.einsum("hqk,khd->qhd", torch.softmax(sc, -1),
                         vr).reshape(t, NH * HD)
        x = x + o @ sd[f"{p}.self_attn.o_proj.weight"].T.float()
        h = _o_rms(x, sd[f"{p}.post_attention_layernorm.weight"])
        x = x + (F.silu(h @ sd[f"{p}.mlp.gate_proj.weight"].T.float())
                 * (h @ sd[f"{p}.mlp.up_proj.weight"].T.float())) @ \
            sd[f"{p}.mlp.down_proj.weight"].T.float()
    x = _o_rms(x, sd["model.norm.weight"])
    return x @ sd["lm_head.weight"].T.float()


def _o_cfg_logits(sd, cfg, x, p_len, cfg_scale):
    logits = _o_forward(sd, torch.from_numpy(x).long())
    if cfg_scale <= 0:
        return logits
    un = x.copy()
    un[:p_len] = cfg.mask_token_id
    un_l = _o_forward(sd, torch.from_numpy(un).long())
    return un_l + (cfg_scale + 1) * (logits - un_l)


def _o_mmu(sd, cfg, prompt, gen_len, steps, block_length,
           cfg_scale=0.0):
    p_len = len(prompt)
    x = np.concatenate([prompt, np.full((gen_len,), MASK, np.int32)])
    vm = torch.zeros(V)
    vm[TV:] = -1e30
    n_blocks = max(gen_len // block_length, 1)
    steps_per = max(steps // n_blocks, 1)
    for b in range(n_blocks):
        b0, b1 = p_len + b * block_length, p_len + (b + 1) * \
            block_length
        transfer = num_transfer_tokens(block_length, steps_per)
        for s in range(steps_per):
            logits = _o_cfg_logits(sd, cfg, x, p_len, cfg_scale) + \
                vm[None]
            x0 = logits.argmax(-1).numpy()
            probs = torch.softmax(logits, -1).numpy()
            conf = probs[np.arange(len(x)), x0]
            conf = np.where(x == MASK, conf, -np.inf)
            conf[:b0] = -np.inf
            conf[b1:] = -np.inf
            k = int(transfer[s])
            pick = np.argsort(-conf)[:k]
            pick = pick[conf[pick] > -np.inf]
            x[pick] = x0[pick]
        if np.all(x[b0:b1] == EOT):
            break
    return x[p_len:]


def _o_fastdllm(sd, cfg, prompt, gen_len, block_length, threshold):
    p_len = len(prompt)
    x = np.concatenate([prompt, np.full((gen_len,), MASK, np.int32)])
    vm = torch.zeros(V)
    vm[TV:] = -1e30
    n_blocks = max(gen_len // block_length, 1)
    for b in range(n_blocks):
        b0, b1 = p_len + b * block_length, p_len + (b + 1) * \
            block_length
        for _ in range(64):
            if not np.any(x[b0:b1] == MASK):
                break
            logits = _o_forward(sd, torch.from_numpy(x).long()) + \
                vm[None]
            x0 = logits.argmax(-1).numpy()
            probs = torch.softmax(logits, -1).numpy()
            conf = probs[np.arange(len(x)), x0]
            mask_idx = x == MASK
            mask_idx[:b0] = False
            mask_idx[b1:] = False
            conf = np.where(mask_idx, conf, -np.inf)
            commit = mask_idx & (conf >= threshold)
            if not commit.any():
                commit[np.argmax(conf)] = True
            x[commit] = x0[commit]
    return x[p_len:]


def _o_maskgit(sd, cfg, ids, start, n, lo, hi, steps):
    """temperature=0: deterministic (no gumbel, no remask noise)."""
    x = ids.copy()
    vm = torch.full((V,), -1e30)
    vm[lo:hi] = 0.0
    region = slice(start, start + n)
    for s in range(steps):
        logits = _o_cfg_logits(sd, cfg, x, start, 0.0) + vm[None]
        x0 = logits.argmax(-1).numpy()
        probs = torch.softmax(logits, -1).numpy()
        conf = probs[np.arange(len(x)), x0]
        still = x[region] == MASK
        cur = np.where(still, x0[region], x[region])
        ratio = (s + 1) / steps
        mask_len = int(np.floor(n * math.cos(math.pi / 2 * ratio)))
        mask_len = min(max(mask_len, 0), int(still.sum()) - 1)
        if s == steps - 1 or mask_len <= 0:
            x[region] = cur
            continue
        c = np.where(still, conf[region], np.inf)
        remask = np.argsort(c)[:mask_len]
        cur[remask] = MASK
        x[region] = cur
    return x[region] - lo


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_loader_and_config(ckpt_dir):
    assert is_dynin_config(HF)
    cfg, params = load_dynin(ckpt_dir, dtype=jnp.float32)
    assert cfg.vocab_size == V
    assert cfg.image_offset == TV and cfg.audio_offset == TV + IC
    assert params["lm_head"]["w"].shape == (HS, V)


def test_forward_parity_vs_torch(ckpt_dir):
    cfg, params = load_dynin(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    ids = np.asarray([3, 9, MASK, 17, MASK, 25], np.int32)
    got = np.asarray(dynin_forward(params, cfg, jnp.asarray(ids)))
    golden = _o_forward(sd, torch.from_numpy(ids).long()).numpy()
    np.testing.assert_allclose(got, golden, rtol=3e-4, atol=3e-4)


def test_transfer_schedule():
    np.testing.assert_array_equal(num_transfer_tokens(10, 4),
                                  [3, 3, 2, 2])
    assert num_transfer_tokens(8, 8).sum() == 8


def test_prompt_builder():
    cfg = DyninConfig.from_json(HF)
    ids, start, n = build_dynin_prompt(cfg, "t2i", [3, 4, 5])
    assert n == 9 and ids[3] == SOI and ids[-1] == EOI
    assert (ids[start:start + n] == MASK).all()
    ids, start, n = build_dynin_prompt(cfg, "t2s", [3])
    assert n == 6 and ids[1] == SOA and ids[-1] == EOA
    # i2i: conditioning image tokens offset into the image slice
    img = np.arange(4).reshape(2, 2)
    ids, start, n = build_dynin_prompt(cfg, "i2i", [3], img)
    assert ids[2] == 0 + TV and ids[5] == 3 + TV


def test_mmu_generate_parity(ckpt_dir):
    cfg, params = load_dynin(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    prompt = np.asarray([3, 9, 17], np.int32)
    got = mmu_generate(params, cfg, prompt, gen_len=8, steps=4,
                       block_length=4, temperature=0.0)
    want = _o_mmu(sd, cfg, prompt, 8, 4, 4)
    np.testing.assert_array_equal(got, want)
    assert (got < TV).all()


def test_mmu_cfg_parity(ckpt_dir):
    cfg, params = load_dynin(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    prompt = np.asarray([5, 11], np.int32)
    got = mmu_generate(params, cfg, prompt, gen_len=4, steps=2,
                       block_length=4, temperature=0.0, cfg_scale=1.5)
    want = _o_mmu(sd, cfg, prompt, 4, 2, 4, cfg_scale=1.5)
    np.testing.assert_array_equal(got, want)


def test_fastdllm_parity(ckpt_dir):
    cfg, params = load_dynin(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    prompt = np.asarray([3, 9, 17], np.int32)
    got = mmu_generate_fastdllm_v1(params, cfg, prompt, gen_len=8,
                                   block_length=4, threshold=0.3,
                                   temperature=0.0)
    want = _o_fastdllm(sd, cfg, prompt, 8, 4, 0.3)
    np.testing.assert_array_equal(got, want)
    assert not (got == MASK).any()


def test_t2i_maskgit_parity(ckpt_dir):
    cfg, params = load_dynin(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    prompt = [3, 4, 5]
    got = t2i_generate(params, cfg, prompt, steps=3, temperature=0.0)
    ids, start, n = build_dynin_prompt(cfg, "t2i", prompt)
    want = _o_maskgit(sd, cfg, ids, start, n, TV, TV + IC,
                      3).reshape(3, 3)
    np.testing.assert_array_equal(got, want)
    assert got.shape == (3, 3)
    assert (got >= 0).all() and (got < IC).all()


def test_t2s_generate_range(ckpt_dir):
    cfg, params = load_dynin(ckpt_dir, dtype=jnp.float32)
    codes = t2s_generate(params, cfg, [7, 8], steps=3,
                         temperature=0.0)
    assert codes.shape == (6,)
    assert (codes >= 0).all() and (codes < AC).all()


def test_front_door_task_routing(ckpt_dir):
    om = DyninOmni(ckpt_dir, dtype=jnp.float32)
    img = om.generate("t2i", "a cat", steps=2, temperature=0.0)
    assert img.shape == (3, 3)
    txt = om.generate("mmu_fastdllm_v1", "hello", gen_len=4,
                      block_length=4, threshold=0.5)
    assert txt.shape == (4,) and (txt < TV).all()
