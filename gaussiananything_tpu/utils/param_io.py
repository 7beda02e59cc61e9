"""Parameter IO: flat-npz export/import and torch-state-dict conversion.

Covers the reference's checkpoint-interop surface (`dist_util.load_state_dict`,
HF checkpoint ingestion `README.md:175-181`): pytrees <-> flat npz for
archival, and a generic torch→flax converter so externally-downloaded
frozen weights (DINOv2 / OpenCLIP, unavailable in this environment) can be
imported into the same-architecture conditioners once provided.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def save_params_npz(path: str, params: Any):
    flat = flatten_dict(params, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params_npz(path: str, template: Optional[Any] = None) -> Any:
    z = np.load(path)
    flat = {tuple(k.split("/")): z[k] for k in z.files}
    params = unflatten_dict(flat)
    if template is not None:
        # validate shapes against the template pytree
        t_flat = flatten_dict(template, sep="/")
        p_flat = flatten_dict(params, sep="/")
        missing = set(t_flat) - set(p_flat)
        extra = set(p_flat) - set(t_flat)
        if missing or extra:
            raise ValueError(f"param mismatch: missing {sorted(missing)[:5]}"
                             f" extra {sorted(extra)[:5]}")
        for k in t_flat:
            if tuple(t_flat[k].shape) != tuple(p_flat[k].shape):
                raise ValueError(
                    f"shape mismatch at {k}: {p_flat[k].shape} vs "
                    f"{t_flat[k].shape}")
    return jax.tree.map(np.asarray, params)


def import_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                            name_map: Callable[[str], Optional[str]],
                            template: Any) -> Any:
    """Convert a torch state dict into a flax param tree.

    `state_dict`: torch name -> numpy array (call `.numpy()` upstream).
    `name_map(torch_name) -> flax 'a/b/c' path or None to skip.
    Linear kernels are transposed (torch stores [out, in]); conv kernels
    are transposed OIHW -> HWIO. Entries missing from the map keep the
    template's values.
    """
    t_flat = flatten_dict(template, sep="/")
    out = dict(t_flat)
    for tname, arr in state_dict.items():
        fname = name_map(tname)
        if fname is None:
            continue
        if fname not in t_flat:
            raise KeyError(f"mapped name {fname} not in template")
        tgt = t_flat[fname]
        a = np.asarray(arr)
        if a.ndim == 2 and a.shape == tgt.shape[::-1]:
            a = a.T                               # torch Linear [out,in]
        elif a.ndim == 4 and a.shape != tgt.shape:
            a = a.transpose(2, 3, 1, 0)           # OIHW -> HWIO
        if tuple(a.shape) != tuple(tgt.shape):
            raise ValueError(f"{tname}->{fname}: shape {a.shape} vs "
                             f"{tgt.shape}")
        out[fname] = a.astype(np.asarray(tgt).dtype)
    return unflatten_dict({tuple(k.split("/")): v for k, v in out.items()})
