"""PyTorch checkpoint -> flax param-tree conversion.

The reference ships .pth checkpoints as {param_key: state_dict} with keys
'params'/'params_ema' and optional 'module.' DDP prefixes (ref:
HAT/ESC/basicsr/models/base_model.py:207-252 save_network, :289-315
load_network). Our flax module trees mirror the torch attribute names with
sequential indices flattened ('blocks.0' -> 'blocks_0'), so conversion is:

  flax path  --('_N' -> '.N')-->  torch name
  leaf transform by (leaf name, source/target shape):
    kernel  <- weight   4D->HWIO transpose / 1x1-conv->Dense squeeze / 2D->T
    scale   <- weight   (LayerNorm)
    bias    <- bias
    custom  <- same torch name, kept verbatim (plk_filter, RPB tables, ...)

Also implements ESC's cross-scale sub-pixel-head surgery: bilinear resize of
to_img weights between x2/x3/x4 checkpoints (ref: esc_arch.py:342-375).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


_SEQ_IDX = re.compile(r"_(\d+)$")

# flax leaves that map onto a torch tensor with the same dotted prefix
_LEAF_TO_TORCH = {"kernel": "weight", "scale": "weight", "bias": "bias",
                  "embedding": "weight"}


def flatten_params(tree, prefix=()) -> Dict[tuple, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten_params(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def unflatten_params(flat: Dict[tuple, Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def flax_path_to_torch_name(path: tuple) -> str:
    """('layers_0','residual_group','blocks_1','mlp_0','kernel')
    -> 'layers.0.residual_group.blocks.1.mlp.0.weight'."""
    comps = []
    for comp in path[:-1]:
        comps.append(_SEQ_IDX.sub(r".\1", comp))
    leaf = path[-1]
    comps.append(_LEAF_TO_TORCH.get(leaf, leaf))
    return ".".join(comps)


def _transform(leaf: str, src: np.ndarray, target_shape: tuple) -> np.ndarray:
    src = np.asarray(src)
    if leaf == "kernel":
        if src.ndim == 5 and len(target_shape) == 5:
            return src.transpose(2, 3, 4, 1, 0)  # OIDHW -> DHWIO (conv3d)
        if src.ndim == 4 and len(target_shape) == 4:
            return src.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if src.ndim == 4 and len(target_shape) == 2:
            return src[:, :, 0, 0].T  # 1x1 conv -> Dense
        if src.ndim == 2 and len(target_shape) == 2:
            return src.T
        if src.ndim == 3 and len(target_shape) == 3:
            return src.transpose(2, 1, 0)  # conv1d OIW -> WIO
        if len(target_shape) == 1:
            return src.reshape(-1)
        raise ValueError(f"No kernel transform {src.shape} -> {target_shape}")
    if src.shape != tuple(target_shape):
        try:
            return src.reshape(target_shape)
        except ValueError as e:
            raise ValueError(f"Shape mismatch for {leaf}: {src.shape} vs "
                             f"{target_shape}") from e
    return src


def strip_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Remove DDP 'module.' prefixes (ref: base_model.py:231-234)."""
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in state_dict.items()}


def convert_state_dict(state_dict: Dict[str, np.ndarray], flax_params: dict,
                       strict: bool = True) -> dict:
    """Map a torch state_dict onto the structure of an initialized flax
    param tree, returning a new tree of numpy arrays."""
    state_dict = strip_module_prefix(state_dict)
    state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
    flat = flatten_params(flax_params)
    out = {}
    used = set()
    missing = []
    for path, target in flat.items():
        name = flax_path_to_torch_name(path)
        if name not in state_dict and path[-1] in _LEAF_TO_TORCH:
            # custom torch params can collide with mapped leaf names (e.g.
            # ATD_CA's 'scale' is a real param, not a LayerNorm weight)
            verbatim = ".".join(_SEQ_IDX.sub(r".\1", c) for c in path)
            if verbatim in state_dict:
                name = verbatim
        if name not in state_dict:
            # literal module names that LOOK like flattened sequences (e.g.
            # BasicVSR++'s ModuleDict key 'backward_1'): retry without the
            # '_N' -> '.N' rewrite on the module components
            raw = ".".join(path[:-1]
                           + (_LEAF_TO_TORCH.get(path[-1], path[-1]),))
            if raw in state_dict:
                name = raw
        if name not in state_dict:
            missing.append(name)
            if strict:
                continue
            out[path] = np.asarray(target)
            continue
        out[path] = _transform(path[-1], state_dict[name],
                               np.shape(target)).astype(np.asarray(target).dtype)
        used.add(name)
    if strict:
        unused = [k for k in state_dict
                  if k not in used and not k.endswith("num_batches_tracked")
                  and "relative_position_index" not in k
                  and not k.endswith(("attn_mask", "init_pos",
                                      "MetaUpsample"))]  # derived buffers
        if missing or unused:
            raise KeyError(f"convert_state_dict strict mismatch.\n"
                           f"  missing in torch: {missing[:10]}\n"
                           f"  unused torch keys: {unused[:10]}")
    return unflatten_params(out)


def load_torch_checkpoint(path: str, flax_params: dict,
                          param_key: str = "params", strict: bool = True) -> dict:
    """Load a reference .pth and convert. Falls back params_ema<->params the
    way load_network does (ref: base_model.py:303-306)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and param_key not in ckpt and "params" in ckpt:
        param_key = "params"
    if isinstance(ckpt, dict) and param_key in ckpt:
        state = ckpt[param_key]
    elif isinstance(ckpt, dict) and "params_ema" in ckpt:
        state = ckpt["params_ema"]
    else:
        state = ckpt
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in state.items()}
    return convert_state_dict(state, flax_params, strict=strict)


def module_state_dict(torch_module) -> Dict[str, np.ndarray]:
    """Extract a numpy state_dict from a live torch module (test oracle)."""
    return {k: v.detach().cpu().numpy()
            for k, v in torch_module.state_dict().items()}


def esc_rescale_to_img(kernel_oihw: np.ndarray, bias: np.ndarray,
                       scale_in: int, scale_out: int):
    """ESC cross-scale checkpoint surgery: bilinearly resize the sub-pixel
    to_img head between upscale factors (ref: esc_arch.py:342-375).

    kernel_oihw: (3*s_in^2, Cin, kh, kw) -> (3*s_out^2, Cin, kh, kw)
    """
    import torch
    import torch.nn.functional as F

    o, cin, kh, kw = kernel_oihw.shape
    k = torch.from_numpy(kernel_oihw.astype(np.float32))
    # (rgb*rh*rw, cin, kh, kw) -> (cin*kh*kw, rgb, rh, rw)
    k = k.reshape(3, scale_in, scale_in, cin, kh, kw).permute(3, 4, 5, 0, 1, 2)
    k = k.reshape(cin * kh * kw, 3, scale_in, scale_in)
    k = F.interpolate(k, size=(scale_out, scale_out), mode="bilinear",
                      align_corners=False)
    k = k.reshape(cin, kh, kw, 3, scale_out, scale_out).permute(3, 4, 5, 0, 1, 2)
    k = k.reshape(3 * scale_out ** 2, cin, kh, kw)

    b = torch.from_numpy(bias.astype(np.float32)).reshape(1, 3, scale_in, scale_in)
    b = F.interpolate(b, size=(scale_out, scale_out), mode="bilinear",
                      align_corners=False).reshape(-1)
    return k.numpy(), b.numpy()
