"""Ranger optimizer (RAdam + Lookahead + gradient centralisation) in optax.

Parity target: src/training/ranger.py (defaults lr, alpha=0.5, k=6,
N_sma_threshhold=5, betas=(.95, 0.999), eps=1e-5, use_gc=True on conv+fc).
Composed from optax primitives rather than a hand-rolled step loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def _centralize(updates):
    """Gradient centralisation: subtract the mean over all non-output dims
    for tensors with rank > 1 (conv + fc weights)."""

    def gc(g):
        if g.ndim > 1:
            axes = tuple(range(1, g.ndim))
            return g - jnp.mean(g, axis=axes, keepdims=True)
        return g

    return jax.tree_util.tree_map(gc, updates)


class GCState(NamedTuple):
    pass


def gradient_centralization() -> optax.GradientTransformation:
    def init_fn(params):
        return GCState()

    def update_fn(updates, state, params=None):
        return _centralize(updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class RAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def radam(
    b1: float = 0.95,
    b2: float = 0.999,
    eps: float = 1e-5,
    sma_threshold: float = 5.0,
) -> optax.GradientTransformation:
    """Rectified Adam; falls back to SGD-with-momentum-style step while the
    variance estimate is untrustworthy (N_sma <= threshold)."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RAdamState(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        mu = optax.incremental_update(updates, state.mu, 1 - b1)
        nu = jax.tree_util.tree_map(
            lambda g, n: b2 * n + (1 - b2) * g * g, updates, state.nu
        )
        t = count.astype(jnp.float32)
        beta2_t = b2**t
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1 - beta2_t)

        rect = jnp.sqrt(
            jnp.maximum(
                (n_sma - 4)
                / jnp.maximum(n_sma_max - 4, 1e-8)
                * (n_sma - 2)
                / jnp.maximum(n_sma, 1e-8)
                * n_sma_max
                / jnp.maximum(n_sma_max - 2, 1e-8),
                0.0,
            )
        ) / (1 - b1**t)
        plain = 1.0 / (1 - b1**t)
        use_var = n_sma > sma_threshold

        def upd(m, n):
            denom = jnp.sqrt(n / (1 - beta2_t)) + eps
            var_step = rect * m / denom
            sgd_step = plain * m
            return jnp.where(use_var, var_step, sgd_step)

        new_updates = jax.tree_util.tree_map(upd, mu, nu)
        return new_updates, RAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    count: jnp.ndarray


def lookahead(
    inner: optax.GradientTransformation, sync_period: int, slow_step_size: float
) -> optax.GradientTransformation:
    """Lookahead without the optax LookaheadParams wrapper: slow weights live
    in the optimizer state; every ``sync_period`` steps the fast weights are
    pulled toward the slow weights."""

    def init_fn(params):
        # EXPLICIT copy: jnp.asarray on a jax array is a no-op, so the slow
        # weights would ALIAS the param buffers. Under donate_argnums the
        # train state then donates the same buffer twice (params + slow),
        # which the TPU runtime rejects at execution (INVALID_ARGUMENT) —
        # same aliasing bug fixed earlier for the EMA copy in coach.py.
        return LookaheadState(
            inner.init(params),
            jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
            jnp.zeros([], jnp.int32),
        )

    def update_fn(updates, state, params):
        u, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = (count % sync_period) == 0
        fast = jax.tree_util.tree_map(lambda p, du: p + du, params, u)
        new_slow = jax.tree_util.tree_map(
            lambda s, f: s + slow_step_size * (f - s), state.slow, fast
        )
        final = jax.tree_util.tree_map(
            lambda f, s: jnp.where(sync, s, f), fast, new_slow
        )
        slow_out = jax.tree_util.tree_map(
            lambda s_new, s_old: jnp.where(sync, s_new, s_old),
            new_slow,
            state.slow,
        )
        u_final = jax.tree_util.tree_map(lambda f, p: f - p, final, params)
        return u_final, LookaheadState(inner_state, slow_out, count)

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(
    learning_rate,
    alpha: float = 0.5,
    k: int = 6,
    b1: float = 0.95,
    b2: float = 0.999,
    eps: float = 1e-5,
    use_gc: bool = True,
) -> optax.GradientTransformation:
    """ref: src/training/ranger.py"""
    chain = []
    if use_gc:
        chain.append(gradient_centralization())
    chain.append(radam(b1=b1, b2=b2, eps=eps))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    inner = optax.chain(*chain)
    return lookahead(inner, sync_period=k, slow_step_size=alpha)
