"""Runtime LoRA adapters.

Reference parity: diffusion/lora/manager.py:36 (DiffusionLoRAManager —
runtime load/unload/scale) and upstream vLLM's AR LoRA. Pure-pytree
design: an adapter is a parallel pytree of {"lora_a","lora_b"} pairs;
`attach` returns a new params tree whose linears carry the adapter
(models/decoder.py `linear` applies x@A@B on top of the base matmul —
works for quantized bases too, where merging is impossible). `merge`
folds the delta into full-precision weights for zero runtime overhead.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)

_LINEAR_NAMES = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj", "lm_head", "mlp_in", "mlp_out",
                 "qkv_proj", "gate_up_proj"}

# fused layout: which separate adapters fold into which fused linear
_FUSE_MAP = {"qkv_proj": ("q_proj", "k_proj", "v_proj"),
             "gate_up_proj": ("gate_proj", "up_proj")}


def _fuse_adapters(layer_p: dict, layer_l: dict) -> dict:
    """Fold separate q/k/v (gate/up) adapters into the fused linear's
    block-diagonal equivalent: lora_a concat on the rank axis, lora_b
    block-diagonal on (rank, out-col) — numerically exact."""
    out = dict(layer_l)
    for fused_name, parts in _FUSE_MAP.items():
        if fused_name not in layer_p:
            continue
        present = [(i, layer_l[p]) for i, p in enumerate(parts)
                   if isinstance(layer_l.get(p), dict)
                   and "lora_a" in layer_l[p]]
        if not present:
            continue
        w = layer_p[fused_name].get("w")
        n_total = w.shape[1] if w is not None else \
            layer_p[fused_name]["w_q"].shape[1]
        # column extents of each part in the fused output axis
        n_parts = len(parts)
        if fused_name == "qkv_proj":
            # q may be wider than k/v (GQA); infer from adapters where
            # possible, split remaining evenly between k and v
            widths = [None] * n_parts
            for i, ad in present:
                widths[i] = ad["lora_b"].shape[1]
            known = sum(x for x in widths if x)
            missing = [i for i, x in enumerate(widths) if x is None]
            if missing:
                each = (n_total - known) // len(missing)
                for i in missing:
                    widths[i] = each
        else:
            widths = [n_total // n_parts] * n_parts
        offs = [0]
        for x in widths:
            offs.append(offs[-1] + x)
        ranks = [ad["lora_a"].shape[1] for _, ad in present]
        a = jnp.concatenate([ad["lora_a"] for _, ad in present], axis=1)
        b = jnp.zeros((sum(ranks), n_total), present[0][1]["lora_b"].dtype)
        r0 = 0
        for (i, ad), r in zip(present, ranks):
            b = b.at[r0:r0 + r, offs[i]:offs[i + 1]].set(ad["lora_b"])
            r0 += r
        out[fused_name] = {"lora_a": a, "lora_b": b}
        for p in parts:
            out.pop(p, None)
    return out


def _walk(node: Any, name: str, fn) -> Any:
    if isinstance(node, dict):
        if name in _LINEAR_NAMES and ("w" in node or "w_q" in node):
            return fn(name, node)
        return {k: _walk(v, k, fn) for k, v in node.items()}
    if isinstance(node, list):
        return [_walk(v, name, fn) for v in node]
    return node


def init_lora(params: dict, rank: int = 8, key=None, scale: float = 1.0,
              targets: Optional[set[str]] = None,
              dtype=jnp.float32) -> dict:
    """Random adapter matching `params` structure (A ~ N(0, 1/r), B = 0
    — standard LoRA init). Returns {path-matching pytree of
    {"lora_a","lora_b"}} with scale folded into B's future updates."""
    # qkv_proj covers the fused layout (q/v adapters have no separate
    # linear to land on there)
    targets = targets or {"q_proj", "v_proj", "qkv_proj"}
    counter = [0]
    key = key if key is not None else jax.random.PRNGKey(0)

    def make(name, node):
        if name not in targets:
            return None
        w = node.get("w")
        if w is not None:
            k_in, n_out = w.shape
        else:
            wq = node["w_q"]
            k_in, n_out = wq.shape
            if wq.dtype == jnp.uint8:  # nibble-packed int4
                k_in *= 2
        counter[0] += 1
        sub = jax.random.fold_in(key, counter[0])
        return {
            "lora_a": (jax.random.normal(sub, (k_in, rank), jnp.float32) /
                       rank).astype(dtype),
            "lora_b": jnp.zeros((rank, n_out), dtype),
        }

    return _walk(params, "", make)


def attach(params: dict, lora: dict, scale: float = 1.0) -> dict:
    """New params tree whose targeted linears carry lora_a/lora_b (scale
    pre-multiplied into lora_b). Base weights are shared, not copied."""

    def walk(p_node, l_node, name):
        if isinstance(p_node, dict):
            if name in _LINEAR_NAMES and ("w" in p_node or
                                          "w_q" in p_node):
                if not isinstance(l_node, dict) or "lora_a" not in l_node:
                    return dict(p_node)
                new = dict(p_node)
                new["lora_a"] = l_node["lora_a"]
                new["lora_b"] = (l_node["lora_b"].astype(jnp.float32) *
                                 scale).astype(l_node["lora_b"].dtype)
                return new
            if isinstance(l_node, dict) and any(
                    p in l_node for ps in _FUSE_MAP.values() for p in ps
                    ) and any(f in p_node for f in _FUSE_MAP):
                # separate-projection adapter (e.g. PEFT q_proj/v_proj)
                # over a fused base layer
                l_node = _fuse_adapters(p_node, l_node)
            return {k: walk(v, (l_node or {}).get(k) if isinstance(
                l_node, dict) else None, k) for k, v in p_node.items()}
        if isinstance(p_node, list):
            l_list = l_node if isinstance(l_node, list) else [None] * len(
                p_node)
            return [walk(v, l, name) for v, l in zip(p_node, l_list)]
        return p_node

    return walk(params, lora, "")


def detach(params: dict) -> dict:
    """Strip adapters (unload)."""

    def walk(node, name):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()
                    if k not in ("lora_a", "lora_b")}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node

    return walk(params, "")


def merge(params: dict) -> dict:
    """Fold adapters into full-precision base weights (w += A@B);
    quantized bases stay unmerged (runtime-add path)."""

    def fold(name, node):
        if "lora_a" not in node:
            return dict(node)
        new = {k: v for k, v in node.items()
               if k not in ("lora_a", "lora_b")}
        if "w" in node:
            delta = jnp.dot(node["lora_a"].astype(jnp.float32),
                            node["lora_b"].astype(jnp.float32))
            new["w"] = (node["w"].astype(jnp.float32) + delta).astype(
                node["w"].dtype)
        else:
            new["lora_a"] = node["lora_a"]  # cannot merge into int weights
            new["lora_b"] = node["lora_b"]
        return new

    return _walk(params, "", fold)


def load_peft_safetensors(path: str, dtype=jnp.float32) -> dict:
    """HF PEFT adapter_model.safetensors → adapter pytree (llama-style
    names: base_model.model.model.layers.N.self_attn.q_proj.lora_A...).

    The standard PEFT scaling lora_alpha / r (adapter_config.json) is
    folded into lora_b at load time, so deltas land with the magnitude
    the adapter was trained for; `LoRAManager.activate`'s scale then
    multiplies on top (user scale, default 1.0)."""
    import json
    import os

    from safetensors import safe_open

    alpha_scale = 1.0
    cfg_path = os.path.join(path, "adapter_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            cfg = json.load(fh)
        r, alpha = cfg.get("r"), cfg.get("lora_alpha")
        if r and alpha:
            alpha_scale = float(alpha) / float(r)

    f = os.path.join(path, "adapter_model.safetensors")
    layers: dict[int, dict] = {}
    with safe_open(f, framework="numpy") as st:
        for tname in st.keys():
            parts = tname.split(".")
            try:
                i = parts.index("layers")
            except ValueError:
                continue
            layer_idx = int(parts[i + 1])
            proj = parts[i + 3] if parts[i + 2] == "self_attn" else \
                parts[i + 3]
            which = "lora_a" if "lora_A" in tname else "lora_b"
            t = np.asarray(st.get_tensor(tname)).T
            if which == "lora_b" and alpha_scale != 1.0:
                t = t * alpha_scale
            arr = jnp.asarray(t).astype(dtype)
            layers.setdefault(layer_idx, {}).setdefault(
                proj, {})[which] = arr
    max_layer = max(layers) if layers else -1
    return {"layers": [layers.get(i, {}) for i in range(max_layer + 1)]}


class LoRAManager:
    """Named adapter registry + engine hookup (reference
    DiffusionLoRAManager: load/unload/scale at runtime)."""

    def __init__(self, base_params: dict) -> None:
        self.base = base_params
        self.adapters: dict[str, dict] = {}
        self.active: Optional[str] = None

    def register(self, name: str, lora: dict) -> None:
        self.adapters[name] = lora

    def load(self, name: str, path: str) -> None:
        self.register(name, load_peft_safetensors(path))

    def activate(self, name: Optional[str],
                 scale: float = 1.0) -> dict:
        """→ params tree to hand to the runner (reload_weights)."""
        self.active = name
        if name is None:
            return self.base
        return attach(self.base, self.adapters[name], scale)
