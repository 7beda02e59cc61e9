"""Train state: params + optax optimiser + EMA, and checkpoint IO via orbax.

Replaces `MixedPrecisionTrainer` + EMA-list + resume machinery
(`guided_diffusion/fp16_util.py:149-296`, `nsr/train_util.py:54-309,520-556`):
under JAX, bf16 activations with fp32 params need no loss scaling; grad clip
and EMA are optax transforms; checkpoints are orbax pytrees (params / opt /
ema / step in one atomic directory), rank-0 logic handled by orbax itself.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainStateConfig:
    lr: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    ema_decay: float = 0.9999
    # Extra EMA rates: the reference tracks one EMA copy per rate in
    # `--ema_rate "0.9999,0.999"` (`nsr/train_util.py:97,159`). The primary
    # rate stays `ema_decay`; each extra rate gets a tree in
    # `TrainState.ema_extra`.
    extra_ema_decays: tuple = ()
    warmup_steps: int = 1000
    betas: tuple = (0.9, 0.95)
    # Per-submodule lr multipliers ((top-level flax module name, mult), …)
    # — the reference's decomposed optim groups with separate encoder_lr /
    # vit_decoder_lr / super_resolution_lr (`nsr/train_util.py:852-905`).
    # A submodule's lr = lr * mult; unnamed submodules use the base lr.
    lr_mults: tuple = ()


def make_optimizer(cfg: TrainStateConfig) -> optax.GradientTransformation:
    def adamw(mult: float) -> optax.GradientTransformation:
        sched = optax.linear_schedule(0.0, cfg.lr * mult, cfg.warmup_steps)
        return optax.adamw(sched, b1=cfg.betas[0], b2=cfg.betas[1],
                           weight_decay=cfg.weight_decay)

    clip = optax.clip_by_global_norm(cfg.grad_clip)
    if not cfg.lr_mults:
        return optax.chain(clip, adamw(1.0))

    mults = dict(cfg.lr_mults)
    transforms = {"default": adamw(1.0),
                  **{k: adamw(m) for k, m in mults.items()}}

    def label_fn(params):
        def lab(path, _):
            for p in path:
                k = getattr(p, "key", getattr(p, "name", None))
                if k in mults:
                    return k
            return "default"

        return jax.tree_util.tree_map_with_path(lab, params)

    return optax.chain(clip, optax.multi_transform(transforms, label_fn))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray
    # Optional {rate-string: params-tree} for extra EMA rates (None when
    # only the primary rate is tracked). Rates are recovered from the dict
    # keys at trace time, so apply_gradients needs no extra argument.
    ema_extra: Any = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               extra_ema_decays: tuple = ()):
        # EMA trees are COPIES, not aliases of params: the jitted train
        # steps donate the whole state, and donating the same underlying
        # buffer twice (params + an aliased ema) is a runtime error. They
        # diverge after the first update regardless.
        copy = lambda: jax.tree.map(jnp.copy, params)        # noqa: E731
        extra = ({f"{d:g}": copy() for d in extra_ema_decays}
                 if extra_ema_decays else None)
        return cls(params=params, opt_state=tx.init(params),
                   ema_params=copy(), step=jnp.zeros((), jnp.int32),
                   ema_extra=extra)

    def apply_gradients(self, grads, tx: optax.GradientTransformation,
                        ema_decay: float = 0.9999) -> "TrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)

        def ema_update(tree, decay):
            # bias-free EMA ramp: min(decay, (1+step)/(10+step))
            d = jnp.minimum(decay, (1.0 + self.step) / (10.0 + self.step))
            return jax.tree.map(lambda e, p: e * d + p * (1 - d),
                                tree, new_params)

        new_ema = ema_update(self.ema_params, ema_decay)
        new_extra = (None if self.ema_extra is None else
                     {k: ema_update(t, float(k))
                      for k, t in self.ema_extra.items()})
        return TrainState(params=new_params, opt_state=new_opt,
                          ema_params=new_ema, step=self.step + 1,
                          ema_extra=new_extra)


# ------------------------------------------------------------ checkpoints

def save_checkpoint(path: str, state: TrainState, keep: int = 3):
    import os
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)  # orbax/tensorstore rejects relative paths
    ckpt = ocp.StandardCheckpointer()
    # force=True: a re-save at the same step (e.g. the unconditional final
    # save when total_steps is a multiple of save_every) overwrites instead
    # of crashing the run at its very end with 'destination already exists'
    ckpt.save(f"{path}/step_{int(state.step):08d}", state, force=True)
    ckpt.wait_until_finished()
    if keep > 0 and os.path.isdir(path):
        steps = sorted(int(d.split("_")[1]) for d in os.listdir(path)
                       if d.startswith("step_"))
        for s in steps[:-keep]:
            shutil.rmtree(f"{path}/step_{s:08d}", ignore_errors=True)


def restore_checkpoint(path: str, template: TrainState,
                       step: Optional[int] = None) -> TrainState:
    import os

    import orbax.checkpoint as ocp

    if step is None:
        steps = sorted(int(d.split("_")[1]) for d in os.listdir(path)
                       if d.startswith("step_"))
        step = steps[-1]
    ckpt = ocp.StandardCheckpointer()
    target = f"{os.path.abspath(path)}/step_{step:08d}"
    try:
        return ckpt.restore(target, template)
    except Exception:
        # Checkpoints trained with extra_ema_decays carry an ema_extra
        # dict the caller's template (usually TrainState.create with
        # ema_extra=None) doesn't know about. Raw-restore to discover the
        # tree, then retry with an augmented template so inference CLIs
        # can load training checkpoints without knowing the EMA config.
        raw = ckpt.restore(target)
        extra = raw.get("ema_extra") if isinstance(raw, dict) else None
        if not extra:
            raise
        tpl2 = dataclasses.replace(
            template, ema_extra={k: template.params for k in extra})
        return ckpt.restore(target, tpl2)


def load_submodule(path: str, state: TrainState, submodule: str,
                   step: Optional[int] = None, ema: bool = False
                   ) -> TrainState:
    """Selective resume: graft ONE top-level flax submodule's weights from a
    checkpoint into `state`, leaving everything else (other submodules,
    optimiser state, step) untouched.

    Reference: `load_submodule_name` (`nsr/train_util.py:78,582-605`) —
    e.g. warm-starting a new VAE run from just a pretrained encoder. The
    checkpoint is restored WITHOUT a template (orbax metadata restore), so
    it may come from a model whose other submodules differ from `state`'s.

    `ema=True` grafts the checkpoint's primary-EMA copy instead of its raw
    params. The grafted tree is installed into BOTH `state.params` and
    `state.ema_params` (matching the reference, which re-seeds each EMA
    list entry from the loaded weights, `nsr/train_util.py:150-164`).
    """
    import os

    import numpy as np
    import orbax.checkpoint as ocp

    if step is None:
        steps = sorted(int(d.split("_")[1]) for d in os.listdir(path)
                       if d.startswith("step_"))
        step = steps[-1]
    raw = ocp.StandardCheckpointer().restore(
        f"{os.path.abspath(path)}/step_{step:08d}")

    def get(tree, key):
        return tree[key] if isinstance(tree, dict) else getattr(tree, key)

    src = get(raw, "ema_params" if ema else "params")["params"]
    if submodule not in src:
        raise KeyError(f"checkpoint has no submodule {submodule!r}; "
                       f"available: {sorted(src)}")
    sub = jax.tree.map(jnp.asarray, src[submodule])
    cur = state.params["params"][submodule]
    cur_leaves = jax.tree_util.tree_leaves_with_path(cur)
    sub_leaves = jax.tree.leaves(sub)
    if len(cur_leaves) != len(sub_leaves):
        raise ValueError(
            f"structure mismatch grafting {submodule!r}: "
            f"{len(cur_leaves)} vs {len(sub_leaves)} leaves")
    for (p, a), b in zip(cur_leaves, sub_leaves):
        if np.shape(a) != np.shape(b):
            raise ValueError(f"shape mismatch grafting {submodule!r} at "
                             f"{jax.tree_util.keystr(p)}: "
                             f"{np.shape(a)} vs {np.shape(b)}")

    def graft(tree):
        return {**tree, "params": {**tree["params"], submodule: sub}}

    return dataclasses.replace(
        state, params=graft(state.params),
        ema_params=graft(state.ema_params),
        # re-seed every extra-rate EMA copy too (the docstring contract —
        # otherwise they keep stale weights for ~1/(1-decay) steps)
        ema_extra=({k: graft(v) for k, v in state.ema_extra.items()}
                   if state.ema_extra else state.ema_extra))


def restore_inference_params(ckpt: Optional[str], template,
                             tx: Optional["optax.GradientTransformation"]
                             = None):
    """Shared CLI restore: imported ``.npz`` (cli.import_release) or an
    orbax training checkpoint (returns its EMA params). Previously
    duplicated across sample/serve/train_flow/extract_latents."""
    if not ckpt:
        return template
    if ckpt.endswith(".npz"):
        from gaussiananything_tpu.utils.param_io import load_params_npz
        return load_params_npz(ckpt, template=template)
    if tx is None:
        tx = make_optimizer(TrainStateConfig())
    return restore_checkpoint(ckpt, TrainState.create(template, tx)
                              ).ema_params
