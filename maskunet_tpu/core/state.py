"""Training state: params + BN statistics + optimizer state + step + RNG.

Everything a checkpoint needs to resume exactly — the reference saves only
`model.state_dict()` (optimizer state is never saved, SURVEY.md §5
checkpoint row); we carry the full state so preemption recovery works.
The cached attention-mask pytree (the reference's run-long random mask,
ade_semantic.py:177-181) lives here too so a resumed run keeps the same
masks.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    model_state: Any          # BatchNorm running stats
    opt_state: Any
    rng: jax.Array            # folds per-step keys for dropout/sampling
    masks: Any = None         # cached per-layer attention key masks


def create(rng: jax.Array, params, model_state, tx, masks=None) -> TrainState:
    import jax.numpy as jnp
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=tx.init(params),
        rng=rng,
        masks=masks,
    )
