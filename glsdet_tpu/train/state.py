"""Train state: params + batch stats + optimizer + EMA + BoIW buffers.

The reference keeps EMA weights via ``ExpMomentumEMAHook`` (buffers swapped
around epoch boundaries, ema.py:84-102) and the BoIW dictionary as module
buffers persisted in checkpoints (mp_head.py:78-81).  Here both are
explicit fields of an immutable train-state pytree, checkpointed together
by orbax, so resume restores the full training trajectory (step, optimizer
moments, EMA, dictionary, RNG).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from glsdet_tpu.train.boiw import BoIWState
from glsdet_tpu.train.schedules import ema_momentum


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    rng: jax.Array
    boiw: Optional[BoIWState] = None

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation,
               rng: jax.Array, boiw: Optional[BoIWState] = None):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            # real copy: identity-aliased EMA buffers break jit donation
            # ("attempt to donate the same buffer twice")
            ema_params=jax.tree.map(jnp.array, params),
            rng=rng,
            boiw=boiw,
        )


def apply_updates(state: TrainState, tx: optax.GradientTransformation,
                  grads, new_batch_stats, new_boiw=None,
                  new_rng=None) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    m = ema_momentum(state.step)
    new_ema = jax.tree.map(
        lambda e, p: e * (1 - m) + p * m, state.ema_params, new_params)
    return state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_batch_stats,
        opt_state=new_opt,
        ema_params=new_ema,
        boiw=new_boiw if new_boiw is not None else state.boiw,
        rng=new_rng if new_rng is not None else state.rng,
    )
