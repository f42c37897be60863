"""Orbax checkpointing with the reference's dual-key scheme.

The reference saves {param_key: state_dict} with both 'params' and
'params_ema' (ref: base_model.py:207-252, sr_model.py:274-279) plus a
separate trainer .state file. TPU-native: one orbax checkpoint directory
holds {'params', 'params_ema', 'opt_state', 'step', 'epoch'}; loading
supports param-key fallback like load_network (base_model.py:303-306).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_params(path: str, tree: dict, retries: int = 3) -> None:
    """Save a pytree (e.g. {'params': ..., 'params_ema': ...}) to `path`.

    Retries transient IO failures like the reference's save loops (3
    attempts, 1 s apart — ref: base_model.py:237-252,335-350); a final
    failure logs and raises rather than silently dropping the checkpoint."""
    import time

    from super_resolution_tpu.utils.logger import get_root_logger

    last_exc = None
    for attempt in range(retries):
        try:
            ckptr = _checkpointer()
            ckptr.save(os.path.abspath(path), tree, force=True)
            ckptr.wait_until_finished()
            return
        except OSError as exc:
            # Only transient IO errors are worth retrying; orbax raises
            # ValueError for deterministic problems (pytree/structure
            # mismatch), which must surface immediately.
            last_exc = exc
            get_root_logger().warning(
                f"checkpoint save to {path} failed "
                f"(attempt {attempt + 1}/{retries}): {exc}")
            time.sleep(1)
    raise last_exc


def load_tree(path: str, template: Any = None) -> Any:
    ckptr = _checkpointer()
    if template is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), target=template)


def load_params(path: str, template: Any, param_key: str = "params") -> Any:
    """Load one param tree out of a checkpoint, with params<->params_ema
    fallback."""
    tree = load_tree(path)
    for key in (param_key, "params", "params_ema"):
        if isinstance(tree, dict) and key in tree:
            tree = tree[key]
            break
    return jax_tree_cast(tree, template)


def jax_tree_cast(tree: Any, template: Any) -> Any:
    """Recursively coerce loaded arrays to the template's dtypes."""
    import jax

    if template is None:
        return tree
    return jax.tree.map(lambda t, x: np.asarray(x).astype(np.asarray(t).dtype),
                        template, tree)
