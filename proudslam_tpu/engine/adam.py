"""Minimal Adam with torch-matching semantics (bias correction, eps outside
sqrt of v-hat), operating on pytrees.

The reference drives every optimization with ``torch.optim.Adam`` defaults
(betas 0.9/0.999, eps 1e-8): tracking pose (`render_helpers.py:700`),
embeddings/decoder (`mapping.py:81-82`), keyframe poses (`frame.py:27`).
Implemented by hand (rather than optax) so per-row warm-started moments for
the keyframe pose table are first-class.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

B1, B2, EPS = 0.9, 0.999, 1e-8


class AdamState(NamedTuple):
    m: jax.Array
    v: jax.Array
    t: jax.Array  # () int32


def init_adam(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     t=jnp.zeros((), dtype=jnp.int32))


def adam_update(params, grads, state: AdamState, lr: float
                ) -> Tuple[jax.Array, AdamState]:
    t = state.t + 1
    tf = t.astype(jnp.float32)
    bc1 = 1.0 - B1 ** tf
    bc2 = 1.0 - B2 ** tf

    def upd(p, g, m, v):
        m_new = B1 * m + (1 - B1) * g
        v_new = B2 * v + (1 - B2) * g * g
        step = lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS)
        return p - step, m_new, v_new

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(m=new_m, v=new_v, t=t)


def adam_update_rows(params: jnp.ndarray, grads: jnp.ndarray,
                     m: jnp.ndarray, v: jnp.ndarray, t: jnp.ndarray,
                     lr: float, row_mask: jnp.ndarray):
    """Per-row Adam for a (K, D) table where each row has its own step count
    ``t`` (K,) and only rows with ``row_mask`` update (others untouched).

    Used for the keyframe pose table: each keyframe carries a persistent
    optimizer in the reference (`frame.py:27`), warm-started from tracking.
    """
    mask = row_mask.astype(params.dtype)[:, None]
    t_new = t + row_mask.astype(t.dtype)
    tf = jnp.maximum(t_new, 1).astype(jnp.float32)[:, None]
    m_new = B1 * m + (1 - B1) * grads
    v_new = B2 * v + (1 - B2) * grads * grads
    bc1 = 1.0 - B1 ** tf
    bc2 = 1.0 - B2 ** tf
    step = lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS)
    params_out = params - step * mask
    m_out = jnp.where(mask > 0, m_new, m)
    v_out = jnp.where(mask > 0, v_new, v)
    return params_out, m_out, v_out, t_new
