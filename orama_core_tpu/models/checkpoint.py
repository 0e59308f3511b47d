"""Model parameter checkpointing via Orbax.

The search index has its own persistence (npz generations); model params
(encoder/LLM pytrees — random-init, HF-converted, or future fine-tuned)
save/restore through Orbax's StandardCheckpointer, the JAX-ecosystem
format that survives mesh/sharding changes.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str, like: Optional[Any] = None) -> Any:
    """Restore a param pytree. ``like`` (a pytree of matching structure,
    e.g. fresh init_params output) restores with correct dtypes/shardings;
    without it the stored structure is used as-is."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            import jax

            template = jax.tree.map(
                lambda x: ocp.utils.to_shape_dtype_struct(x)
                if hasattr(x, "shape")
                else x,
                like,
            )
            return ckptr.restore(path, template)
        return ckptr.restore(path)
