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
    warmup_steps: int = 1000
    betas: tuple = (0.9, 0.95)


def make_optimizer(cfg: TrainStateConfig) -> optax.GradientTransformation:
    sched = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(sched, b1=cfg.betas[0], b2=cfg.betas[1],
                    weight_decay=cfg.weight_decay),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(params=params, opt_state=tx.init(params),
                   ema_params=params, step=jnp.zeros((), jnp.int32))

    def apply_gradients(self, grads, tx: optax.GradientTransformation,
                        ema_decay: float = 0.9999) -> "TrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        # bias-free EMA ramp: min(decay, (1+step)/(10+step))
        d = jnp.minimum(ema_decay,
                        (1.0 + self.step) / (10.0 + self.step))
        new_ema = jax.tree.map(lambda e, p: e * d + p * (1 - d),
                               self.ema_params, new_params)
        return TrainState(params=new_params, opt_state=new_opt,
                          ema_params=new_ema, step=self.step + 1)


# ------------------------------------------------------------ checkpoints

def save_checkpoint(path: str, state: TrainState, keep: int = 3):
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)  # orbax/tensorstore rejects relative paths
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(f"{path}/step_{int(state.step):08d}", state)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState,
                       step: Optional[int] = None) -> TrainState:
    import os

    import orbax.checkpoint as ocp

    if step is None:
        steps = sorted(int(d.split("_")[1]) for d in os.listdir(path)
                       if d.startswith("step_"))
        step = steps[-1]
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(f"{os.path.abspath(path)}/step_{step:08d}", template)
