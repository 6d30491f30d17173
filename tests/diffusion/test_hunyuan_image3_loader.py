"""HunyuanImage3 real-geometry family tests.

Checkpoint fixture is written in the genuine HF layout (root
config.json with embedded vae config, model.layers.* HunYuan MoE
naming, patch_embed/final_layer UNet modules, torch [out, in] Linear
weights). The numeric oracle is an independent torch re-implementation
of the reference semantics (hunyuan_image3_transformer.py: rope BEFORE
qk-norm, centered 2D rope build_2d_rope:249, causal+image-block-full
mask :655, adaptive-GN ResBlocks :2931, softmax-topk-renorm MoE with
gated shared MLP :1444) so transpose/naming/order mistakes cannot
cancel out."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.hunyuan_image3 import (  # noqa: E402
    HI3Config, hi3_first_step_mask, hi3_forward_first, hi3_forward_step,
    hi3_rope, hi3_step_mask, is_hunyuan_image3_dir, load_hunyuan_image3)

HF = {
    "architectures": ["HunyuanImage3ForCausalLM"],
    "model_type": "Hunyuan",
    "vocab_size": 64, "hidden_size": 32, "intermediate_size": 48,
    "moe_intermediate_size": 16, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 8,
    "num_experts": 4, "moe_topk": 2, "num_shared_expert": 1,
    "use_mixed_mlp_moe": 1, "moe_layer_num_skipped": 1,
    "use_qk_norm": True, "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    "patch_size": 1, "patch_embed_hidden_dim": 32,
    "bos_token_id": 1, "eos_token_id": 2, "pad_token_id": 0,
    "boi_token_id": 4, "eoi_token_id": 5, "image_token_id": 6,
    "timestep_token_id": 7,
    "vae": {"latent_channels": 4, "ffactor_spatial": 16,
            "scaling_factor": 1.0},
}
HS, LC, HC, FQ = 32, 4, 32, 256


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)

    def lin(o, i, bias=True):
        out = {"weight": torch.randn(o, i, generator=g) * (i ** -0.5)}
        if bias:
            out["bias"] = torch.randn(o, generator=g) * 0.02
        return out

    def put(sd, prefix, o, i, bias=True):
        for k, v in lin(o, i, bias).items():
            sd[f"{prefix}.{k}"] = v

    def conv(sd, prefix, o, i, k=3):
        sd[f"{prefix}.weight"] = torch.randn(o, i, k, k,
                                             generator=g) * 0.1
        sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    def norm(sd, prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.02

    def resblock(sd, prefix, cin, cout):
        norm(sd, f"{prefix}.in_layers.0", cin)
        conv(sd, f"{prefix}.in_layers.2", cout, cin)
        put(sd, f"{prefix}.emb_layers.1", 2 * cout, HS)
        norm(sd, f"{prefix}.out_layers.0", cout)
        conv(sd, f"{prefix}.out_layers.3", cout, cout)
        if cin != cout:
            sd[f"{prefix}.skip_connection.weight"] = torch.randn(
                cout, cin, 1, 1, generator=g) * 0.1
            sd[f"{prefix}.skip_connection.bias"] = torch.randn(
                cout, generator=g) * 0.02

    sd = {}
    sd["model.embed_tokens.weight"] = torch.randn(
        HF["vocab_size"], HS, generator=g) * 0.02
    for li in range(HF["num_hidden_layers"]):
        p = f"model.layers.{li}"
        sd[f"{p}.input_layernorm.weight"] = torch.rand(
            HS, generator=g) + 0.5
        sd[f"{p}.post_attention_layernorm.weight"] = torch.rand(
            HS, generator=g) + 0.5
        put(sd, f"{p}.self_attn.q_proj", 4 * 8, HS, bias=False)
        put(sd, f"{p}.self_attn.k_proj", 2 * 8, HS, bias=False)
        put(sd, f"{p}.self_attn.v_proj", 2 * 8, HS, bias=False)
        put(sd, f"{p}.self_attn.o_proj", HS, 4 * 8, bias=False)
        sd[f"{p}.self_attn.query_layernorm.weight"] = torch.rand(
            8, generator=g) + 0.5
        sd[f"{p}.self_attn.key_layernorm.weight"] = torch.rand(
            8, generator=g) + 0.5
        if li < HF["moe_layer_num_skipped"]:
            put(sd, f"{p}.mlp.gate_proj", 48, HS, bias=False)
            put(sd, f"{p}.mlp.up_proj", 48, HS, bias=False)
            put(sd, f"{p}.mlp.down_proj", HS, 48, bias=False)
        else:
            sd[f"{p}.mlp.gate.weight"] = torch.randn(
                HF["num_experts"], HS, generator=g) * 0.1
            for e in range(HF["num_experts"]):
                put(sd, f"{p}.mlp.experts.{e}.gate_proj", 16, HS,
                    bias=False)
                put(sd, f"{p}.mlp.experts.{e}.up_proj", 16, HS,
                    bias=False)
                put(sd, f"{p}.mlp.experts.{e}.down_proj", HS, 16,
                    bias=False)
            put(sd, f"{p}.mlp.shared_mlp.gate_proj", 48, HS, bias=False)
            put(sd, f"{p}.mlp.shared_mlp.up_proj", 48, HS, bias=False)
            put(sd, f"{p}.mlp.shared_mlp.down_proj", HS, 48, bias=False)
    sd["model.norm.weight"] = torch.rand(HS, generator=g) + 0.5
    for te in ("time_embed", "time_embed_2", "timestep_emb"):
        put(sd, f"{te}.mlp.0", HS, FQ)
        put(sd, f"{te}.mlp.2", HS, HS)
    conv(sd, "patch_embed.model.0", HC, LC)
    resblock(sd, "patch_embed.model.1", HC, HS)
    resblock(sd, "final_layer.model.0", HS, HC)
    norm(sd, "final_layer.model.1.0", HC)
    conv(sd, "final_layer.model.1.2", LC, HC)
    # components our loader must SKIP
    sd["lm_head.weight"] = torch.randn(HF["vocab_size"], HS,
                                       generator=g)
    sd["vae.decoder.conv_in.weight"] = torch.randn(4, 4, 3, 3,
                                                   generator=g)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("hi3_tiny")
    with open(root / "config.json", "w") as f:
        json.dump(HF, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def _o_rms(x, w, eps=1e-5):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(v + eps)) * w.float()


def _o_sinusoid(t, dim=FQ, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) *
                      torch.arange(half).float() / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _o_tembed(sd, pre, t):
    h = _o_sinusoid(t) @ sd[f"{pre}.mlp.0.weight"].T.float() + \
        sd[f"{pre}.mlp.0.bias"].float()
    h = F.gelu(h)
    return h @ sd[f"{pre}.mlp.2.weight"].T.float() + \
        sd[f"{pre}.mlp.2.bias"].float()


def _o_gn(x, w, b, groups=32, eps=1e-5):
    # x NCHW
    return F.group_norm(x.float(), groups, w.float(), b.float(), eps)


def _o_resblock(sd, pre, x, emb):
    h = _o_gn(x, sd[f"{pre}.in_layers.0.weight"],
              sd[f"{pre}.in_layers.0.bias"])
    h = F.silu(h)
    h = F.conv2d(h, sd[f"{pre}.in_layers.2.weight"].float(),
                 sd[f"{pre}.in_layers.2.bias"].float(), padding=1)
    eo = F.silu(emb) @ sd[f"{pre}.emb_layers.1.weight"].T.float() + \
        sd[f"{pre}.emb_layers.1.bias"].float()
    scale, shift = torch.chunk(eo, 2, dim=1)
    h = _o_gn(h, sd[f"{pre}.out_layers.0.weight"],
              sd[f"{pre}.out_layers.0.bias"])
    h = h * (1.0 + scale[..., None, None]) + shift[..., None, None]
    h = F.silu(h)
    h = F.conv2d(h, sd[f"{pre}.out_layers.3.weight"].float(),
                 sd[f"{pre}.out_layers.3.bias"].float(), padding=1)
    skip = x
    if f"{pre}.skip_connection.weight" in sd:
        skip = F.conv2d(x.float(),
                        sd[f"{pre}.skip_connection.weight"].float(),
                        sd[f"{pre}.skip_connection.bias"].float())
    return skip + h


def _o_rope(prompt_len, h_tok, w_tok, tail, d=8, base=10000.0):
    theta = 1.0 / (base ** (torch.arange(0, d, 2).float() / d))
    theta = theta.reshape(-1, 2)
    L, n = prompt_len, h_tok * w_tok
    ys = [torch.arange(L).float()]
    xs = [torch.arange(L).float()]
    beta_y = L + (n - h_tok) / 2
    beta_x = L + (n - w_tok) / 2
    gy = torch.linspace(beta_y, beta_y + h_tok, h_tok + 1)[:h_tok]
    gx = torch.linspace(beta_x, beta_x + w_tok, w_tok + 1)[:w_tok]
    grid = torch.meshgrid(gy, gx, indexing="ij")
    ys.append(grid[0].reshape(-1))
    xs.append(grid[1].reshape(-1))
    ys.append(torch.arange(L + n, L + n + tail).float())
    xs.append(torch.arange(L + n, L + n + tail).float())
    pos = torch.stack([torch.cat(ys), torch.cat(xs)], dim=1)  # [S,2]
    idx = (pos[:, None, :] * theta[None]).reshape(pos.shape[0], -1)
    return torch.cos(idx), torch.sin(idx)


def _o_apply_rope(x, cos, sin):
    # x [B, T, H, D], NeoX half rotation
    c = torch.cat([cos, cos], dim=-1)[None, :, None, :]
    s = torch.cat([sin, sin], dim=-1)[None, :, None, :]
    half = x.shape[-1] // 2
    rot = torch.cat([-x[..., half:], x[..., :half]], dim=-1)
    return x.float() * c + rot.float() * s


def _o_moe(sd, p, x):
    # x [T, H]
    logits = x @ sd[f"{p}.mlp.gate.weight"].T.float()
    probs = torch.softmax(logits, dim=-1)
    topk_p, topk_i = torch.topk(probs, HF["moe_topk"], dim=-1)
    topk_p = topk_p / topk_p.sum(-1, keepdim=True)
    out = torch.zeros_like(x)
    for e in range(HF["num_experts"]):
        gate = x @ sd[f"{p}.mlp.experts.{e}.gate_proj.weight"].T.float()
        up = x @ sd[f"{p}.mlp.experts.{e}.up_proj.weight"].T.float()
        act = F.silu(gate) * up
        eo = act @ sd[f"{p}.mlp.experts.{e}.down_proj.weight"].T.float()
        w = torch.where(topk_i == e, topk_p,
                        torch.zeros_like(topk_p)).sum(-1)
        out = out + w[:, None] * eo
    g = x @ sd[f"{p}.mlp.shared_mlp.gate_proj.weight"].T.float()
    u = x @ sd[f"{p}.mlp.shared_mlp.up_proj.weight"].T.float()
    out = out + (F.silu(g) * u) @ \
        sd[f"{p}.mlp.shared_mlp.down_proj.weight"].T.float()
    return out


def _o_forward(sd, ids, latents, t, prompt_len, h_tok, w_tok, mask):
    """Full-stream forward (first-step semantics)."""
    b, s = ids.shape
    n = h_tok * w_tok
    x = sd["model.embed_tokens.weight"][ids].float()
    t_emb = _o_tembed(sd, "time_embed", t)
    lat = latents.permute(0, 3, 1, 2).float()  # NHWC→NCHW
    h0 = F.conv2d(lat, sd["patch_embed.model.0.weight"].float(),
                  sd["patch_embed.model.0.bias"].float(), padding=1)
    h0 = _o_resblock(sd, "patch_embed.model.1", h0, t_emb)
    img_tokens = h0.flatten(2).transpose(1, 2)  # [B, N, HS]
    x[:, prompt_len + 1:prompt_len + 1 + n] = img_tokens
    x[:, prompt_len] = _o_tembed(sd, "timestep_emb", t)
    cos, sin = _o_rope(prompt_len + 1, h_tok, w_tok,
                       s - prompt_len - 1 - n)
    for li in range(HF["num_hidden_layers"]):
        p = f"model.layers.{li}"
        h = _o_rms(x, sd[f"{p}.input_layernorm.weight"])
        q = (h @ sd[f"{p}.self_attn.q_proj.weight"].T.float()
             ).reshape(b, s, 4, 8)
        k = (h @ sd[f"{p}.self_attn.k_proj.weight"].T.float()
             ).reshape(b, s, 2, 8)
        v = (h @ sd[f"{p}.self_attn.v_proj.weight"].T.float()
             ).reshape(b, s, 2, 8)
        q = _o_apply_rope(q, cos, sin)
        k = _o_apply_rope(k, cos, sin)
        q = _o_rms(q, sd[f"{p}.self_attn.query_layernorm.weight"])
        k = _o_rms(k, sd[f"{p}.self_attn.key_layernorm.weight"])
        kr = k.repeat_interleave(2, dim=2)
        vr = v.repeat_interleave(2, dim=2)
        sc = torch.einsum("bqhd,bkhd->bhqk", q, kr) * (8 ** -0.5)
        sc = sc.masked_fill(~mask[:, None], -1e30)
        pr = torch.softmax(sc, dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", pr, vr).reshape(b, s, 32)
        x = x + o @ sd[f"{p}.self_attn.o_proj.weight"].T.float()
        h = _o_rms(x, sd[f"{p}.post_attention_layernorm.weight"])
        if li < HF["moe_layer_num_skipped"]:
            gate = h @ sd[f"{p}.mlp.gate_proj.weight"].T.float()
            up = h @ sd[f"{p}.mlp.up_proj.weight"].T.float()
            m = (F.silu(gate) * up) @ \
                sd[f"{p}.mlp.down_proj.weight"].T.float()
        else:
            m = _o_moe(sd, p, h.reshape(-1, 32)).reshape(b, s, 32)
        x = x + m
    x = _o_rms(x, sd["model.norm.weight"])
    img_h = x[:, prompt_len + 1:prompt_len + 1 + n]
    t2 = _o_tembed(sd, "time_embed_2", t)
    hh = img_h.transpose(1, 2).reshape(b, 32, h_tok, w_tok)
    hh = _o_resblock(sd, "final_layer.model.0", hh, t2)
    hh = _o_gn(hh, sd["final_layer.model.1.0.weight"],
               sd["final_layer.model.1.0.bias"])
    hh = F.silu(hh)
    out = F.conv2d(hh, sd["final_layer.model.1.2.weight"].float(),
                   sd["final_layer.model.1.2.bias"].float(), padding=1)
    return out.permute(0, 2, 3, 1)  # NCHW→NHWC


def _make_stream(prompt_ids, n):
    ids = [HF["bos_token_id"]] + prompt_ids + [HF["boi_token_id"]]
    prompt_len = len(ids)
    ids += [HF["timestep_token_id"]] + [HF["image_token_id"]] * n + \
        [HF["eoi_token_id"]]
    return np.asarray(ids, np.int32), prompt_len


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(ckpt_dir):
    assert is_hunyuan_image3_dir(ckpt_dir)
    cfg, params = load_hunyuan_image3(ckpt_dir, dtype=jnp.float32)
    assert cfg.decoder.num_experts == 4
    assert cfg.decoder.qk_norm and cfg.moe_layer_num_skipped == 1
    assert cfg.vae_downsample == 16
    # MoE layer got stacked expert tensors; dense layer did not
    assert "experts" in params["layers"][1]
    assert params["layers"][1]["experts"]["gate"].shape == (4, 32, 16)
    assert "experts" not in params["layers"][0]
    assert params["patch_embed"]["conv_in"]["w"].shape == (3, 3, 4, 32)


def test_first_step_parity_vs_torch_oracle(ckpt_dir):
    cfg, params = load_hunyuan_image3(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    rng = np.random.default_rng(3)
    h_tok = w_tok = 3
    n = h_tok * w_tok
    ids_np, plen = _make_stream([9, 10, 11, 12, 13], n)
    ids = ids_np[None]
    lat = rng.standard_normal((1, h_tok, w_tok, LC)).astype(np.float32)
    t = np.asarray([700.0], np.float32)
    mask = hi3_first_step_mask(plen, n, 1)
    cos, sin = hi3_rope(cfg, plen + 1, h_tok, w_tok, 1)
    vel, text_kv = hi3_forward_first(
        params, cfg, jnp.asarray(ids), jnp.asarray(lat),
        jnp.asarray(t), jnp.asarray(mask), cos, sin,
        prompt_len=plen, h_tok=h_tok, w_tok=w_tok)
    golden = _o_forward(sd, torch.from_numpy(ids.astype(np.int64)),
                        torch.from_numpy(lat), torch.from_numpy(t),
                        plen, h_tok, w_tok,
                        torch.from_numpy(mask)).numpy()
    assert vel.shape == golden.shape == (1, h_tok, w_tok, LC)
    np.testing.assert_allclose(np.asarray(vel), golden, rtol=2e-4,
                               atol=2e-4)
    assert len(text_kv) == 2
    assert text_kv[0][0].shape == (1, plen, 2, 8)


def test_cached_step_parity_vs_full_forward(ckpt_dir):
    """Step 2 runs only [timestep, img] rows against cached text KV —
    must equal the oracle FULL forward at the new (t, latents): text
    rows attend only text (causal), so their K/V are step-invariant."""
    cfg, params = load_hunyuan_image3(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    rng = np.random.default_rng(4)
    h_tok = w_tok = 2
    n = h_tok * w_tok
    ids_np, plen = _make_stream([20, 21, 22], n)
    ids = ids_np[None]
    mask1 = hi3_first_step_mask(plen, n, 1)
    cos, sin = hi3_rope(cfg, plen + 1, h_tok, w_tok, 1)
    lat1 = rng.standard_normal((1, h_tok, w_tok, LC)).astype(np.float32)
    t1 = np.asarray([999.0], np.float32)
    _, text_kv = hi3_forward_first(
        params, cfg, jnp.asarray(ids), jnp.asarray(lat1),
        jnp.asarray(t1), jnp.asarray(mask1), cos, sin,
        prompt_len=plen, h_tok=h_tok, w_tok=w_tok)
    lat2 = rng.standard_normal((1, h_tok, w_tok, LC)).astype(np.float32)
    t2 = np.asarray([500.0], np.float32)
    mask2 = hi3_step_mask(plen, n)
    cos_s = jnp.concatenate([cos[plen:plen + 1],
                             cos[plen + 1:plen + 1 + n]], axis=0)
    sin_s = jnp.concatenate([sin[plen:plen + 1],
                             sin[plen + 1:plen + 1 + n]], axis=0)
    vel = hi3_forward_step(params, cfg, text_kv, jnp.asarray(lat2),
                           jnp.asarray(t2), jnp.asarray(mask2),
                           cos_s, sin_s, h_tok=h_tok, w_tok=w_tok)
    golden = _o_forward(sd, torch.from_numpy(ids.astype(np.int64)),
                        torch.from_numpy(lat2), torch.from_numpy(t2),
                        plen, h_tok, w_tok,
                        torch.from_numpy(mask1)).numpy()
    np.testing.assert_allclose(np.asarray(vel), golden, rtol=3e-4,
                               atol=3e-4)


def test_fused_checkpoint_spellings_match_split(ckpt_dir, tmp_path):
    """HunYuan-fused qkv_proj (per-kv-group interleaved) and
    gate_and_up_proj ([up; gate]) spellings must load to the same
    params as the split checkpoint (reference load_weights
    split_params_mapping:2001)."""
    sd = _tiny_state_dict()
    fused = {}
    g, hkv, d = 2, 2, 8
    for k, v in sd.items():
        if ".self_attn.q_proj.weight" in k:
            p = k.replace(".q_proj.weight", "")
            q = sd[f"{p}.q_proj.weight"].reshape(hkv, g, d, -1)
            kk = sd[f"{p}.k_proj.weight"].reshape(hkv, 1, d, -1)
            vv = sd[f"{p}.v_proj.weight"].reshape(hkv, 1, d, -1)
            fused[f"{p}.qkv_proj.weight"] = torch.cat(
                [q, kk, vv], dim=1).reshape(-1, HS)
        elif ".self_attn.k_proj." in k or ".self_attn.v_proj." in k:
            continue
        elif ".mlp.experts." in k and (".gate_proj." in k or
                                       ".up_proj." in k):
            if ".up_proj." in k:
                continue
            up = sd[k.replace(".gate_proj.", ".up_proj.")]
            fused[k.replace(".gate_proj.", ".gate_and_up_proj.")] = \
                torch.cat([up, sd[k]], dim=0)
        else:
            fused[k] = v
    root = tmp_path / "hi3_fused"
    root.mkdir()
    with open(root / "config.json", "w") as f:
        json.dump(HF, f)
    save_file(fused, str(root / "model.safetensors"))
    _, p_split = load_hunyuan_image3(ckpt_dir, dtype=jnp.float32)
    _, p_fused = load_hunyuan_image3(str(root), dtype=jnp.float32)
    import jax

    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=0), p_split, p_fused)


def test_runner_end_to_end(ckpt_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=ckpt_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=5.0)
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "hunyuan_image3"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny test image",
        DiffusionSamplingParams(num_inference_steps=3, height=32,
                                width=32, guidance_scale=5.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None
    assert out.images.shape[-1] == 3
    assert np.isfinite(np.asarray(out.images, np.float32)).all()
