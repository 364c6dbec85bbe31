"""Optimizers & LR schedules beyond Adam.

Reference: src/ops/optim/ranger.py:29-164 (Ranger = RAdam + Lookahead +
gradient centralization, selectable via YAML `optim type: Ranger`,
src/models/OOD_faceGAN_model.py:403-404) and
BasicSR/basicsr/models/lr_scheduler.py:6-96 (MultiStepRestartLR /
CosineAnnealingRestartLR). Expressed as optax transforms / schedules.
"""

import math

import jax
import jax.numpy as jnp
import optax


def gradient_centralization(gc_conv_only: bool = False):
    """Subtract the per-filter mean from multi-dim gradients
    (ranger.py gc_loc branch: grad.add_(-grad.mean(dim>0, keepdim=True)))."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def center(g):
            min_dims = 4 if gc_conv_only else 2
            if g.ndim >= min_dims:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree_util.tree_map(center, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def lookahead_flat(inner, sync_period=6, slow_step_size=0.5):
    """Lookahead that composes with plain optax.apply_updates: the slow-weight
    copy lives in the optimizer state; every sync_period steps the emitted
    update snaps the (fast) params onto the interpolated slow weights
    (ranger.py:129-141)."""

    def init_fn(params):
        return {"inner": inner.init(params),
                "slow": jax.tree_util.tree_map(jnp.asarray, params),
                "count": jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params):
        assert params is not None, "lookahead_flat needs params"
        u, inner_state = inner.update(updates, state["inner"], params)
        count = state["count"] + 1
        sync = (count % sync_period) == 0

        def step(p, du, slow):
            fast_new = p + du
            slow_new = jnp.where(sync,
                                 slow + slow_step_size * (fast_new - slow),
                                 slow)
            out = jnp.where(sync, slow_new - p, du)
            return out, slow_new

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_u = treedef.flatten_up_to(u)
        flat_s = treedef.flatten_up_to(state["slow"])
        outs, slows = zip(*[step(p, du, s)
                            for p, du, s in zip(flat_p, flat_u, flat_s)])
        return (jax.tree_util.tree_unflatten(treedef, outs),
                {"inner": inner_state,
                 "slow": jax.tree_util.tree_unflatten(treedef, slows),
                 "count": count})

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(learning_rate, betas=(0.95, 0.999), eps=1e-5, weight_decay=0.0,
           alpha=0.5, k=6, use_gc=True, gc_conv_only=False):
    """Ranger: gradient centralization -> RAdam -> Lookahead(k, alpha)."""
    chain = []
    if use_gc:
        chain.append(gradient_centralization(gc_conv_only))
    chain.append(optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    if callable(learning_rate):
        chain.append(optax.scale_by_schedule(lambda s: -learning_rate(s)))
    else:
        chain.append(optax.scale(-learning_rate))
    inner = optax.chain(*chain)
    return lookahead_flat(inner, sync_period=k, slow_step_size=alpha)


def make_optimizer(optim_type: str, lr, betas=(0.9, 0.999), **kwargs):
    """The reference's get_optimizer switch (OOD_faceGAN_model.py:399-407)."""
    if optim_type == "Adam":
        sched = (lambda s: -lr(s)) if callable(lr) else None
        core = optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                   eps=kwargs.get("eps", 1e-8))
        tail = (optax.scale_by_schedule(sched) if sched is not None
                else optax.scale(-lr))
        return optax.chain(core, tail)
    if optim_type == "SGD":
        tail = (optax.scale_by_schedule(lambda s: -lr(s)) if callable(lr)
                else optax.scale(-lr))
        mom = kwargs.get("momentum", 0.0)
        if mom:
            return optax.chain(optax.trace(decay=mom), tail)
        return tail
    if optim_type == "Ranger":
        return ranger(lr, betas=kwargs.get("ranger_betas", (0.95, 0.999)),
                      eps=kwargs.get("eps", 1e-5),
                      weight_decay=kwargs.get("weight_decay", 0.0),
                      alpha=kwargs.get("alpha", 0.5), k=kwargs.get("k", 6),
                      use_gc=kwargs.get("use_gc", True))
    raise NotImplementedError(f"optimizer {optim_type}")


def cosine_annealing_restart_lr(base_lr, periods, restart_weights=None,
                                eta_min=0.0):
    """BasicSR CosineAnnealingRestartLR (lr_scheduler.py:57-96) as an optax
    schedule: cosine decay within each period, scaled by its restart weight."""
    restart_weights = restart_weights or [1.0] * len(periods)
    assert len(periods) == len(restart_weights)
    cum = [0]
    for p in periods:
        cum.append(cum[-1] + p)
    cum_j = jnp.asarray(cum)
    periods_j = jnp.asarray(periods, jnp.float32)
    weights_j = jnp.asarray(restart_weights, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.clip(jnp.searchsorted(cum_j[1:], step, side="right"),
                       0, len(periods) - 1)
        start = cum_j[idx].astype(jnp.float32)
        period = periods_j[idx]
        w = weights_j[idx]
        t = jnp.clip((step - start) / period, 0.0, 1.0)
        return eta_min + w * 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * t))

    return schedule
