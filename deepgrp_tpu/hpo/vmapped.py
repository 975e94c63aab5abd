"""TPU-native parallel HPO trials: N trials under one vmap.

Trials that share an architecture (vecsize, units, rnn type, attention,
batch size, repeat_probability) but vary in continuous hyperparameters
(learning_rate, momentum, rho, epsilon, dropout) are trained
SIMULTANEOUSLY: parameters, optimizer states and hyperparameters are
stacked on a leading trial axis and the whole optimization step is
``vmap``-ed — one compiled program advances every trial per dispatch,
saturating the chip far better than the reference's one-at-a-time sweep
(SURVEY §2 "HPO driver"; BASELINE north star "vmapped parallel trials").

Optimizer hyperparameters become vmappable via
``optax.inject_hyperparams`` (they live in the optimizer *state*).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepgrp_tpu.config import Options
from deepgrp_tpu.data.preprocess import Data
from deepgrp_tpu.models.model import DeepGRPModel, create_model
from deepgrp_tpu.train.sampler import BatchSampler
from deepgrp_tpu.train.training import categorical_crossentropy

VARYING_KEYS = ("learning_rate", "momentum", "rho", "epsilon", "dropout")


def _injected_optimizer(name: str) -> optax.GradientTransformation:
    if name == "RMSprop":
        return optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=1e-3, decay=0.9, eps=1e-10, momentum=0.9)
    if name == "Adam":
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-10)
    raise ValueError(f"parallel trials support RMSprop/Adam, got {name!r}")


def _set_hyperparams(opt_state, name: str, hp: Dict[str, jax.Array]):
    hyper = dict(opt_state.hyperparams)
    if name == "RMSprop":
        hyper.update(learning_rate=hp["learning_rate"],
                     momentum=hp["momentum"], decay=hp["rho"],
                     eps=hp["epsilon"])
    else:
        hyper.update(learning_rate=hp["learning_rate"], b1=hp["momentum"],
                     b2=hp["rho"], eps=hp["epsilon"])
    return opt_state._replace(hyperparams=hyper)


def stack_trial_hyperparams(base: Options,
                            trial_dicts: List[Dict[str, Any]]
                            ) -> Dict[str, np.ndarray]:
    """Dense [n_trials] arrays for each varying hyperparameter."""
    out = {}
    for key in VARYING_KEYS:
        out[key] = np.array(
            [float(t.get(key, base[key])) for t in trial_dicts],
            dtype=np.float32)
    return out


@partial(jax.jit, static_argnames=("model", "optimizer_name", "sampler_static",
                                   "vecsize"),
         donate_argnums=(0, 1))
def _parallel_step(params, opt_states, hp, keys, active, fwd, lbl,
                   candidates, lengths, sampler_static,
                   model: DeepGRPModel, optimizer_name: str, vecsize: int):
    """One fleet step; trials with ``active=False`` are frozen.

    Inactive (early-stopped) trials still ride the vmap lockstep — the
    SIMD fleet cannot shrink mid-run — but their parameter updates are
    masked to zero, so their weights stay exactly at the stopping point
    (reference per-trial early-stop semantics, training.py:33-38).
    """
    from deepgrp_tpu.train import sampler as sampler_lib

    optimizer = _injected_optimizer(optimizer_name)
    n_sampled, ocs, batch, seq_len = sampler_static

    def one_trial(params, opt_state, hp, key, active):
        key_sample, key_dropout = jax.random.split(key)
        starts = sampler_lib._sample_starts(key_sample, candidates, lengths,
                                            n_sampled, ocs, batch, seq_len,
                                            vecsize)

        def cut(buf, start):
            return jax.lax.dynamic_slice(buf, (start, 0),
                                         (vecsize, buf.shape[1]))

        x = jax.vmap(lambda s: cut(fwd, s))(starts).astype(jnp.float32)
        y = jax.vmap(lambda s: cut(lbl, s))(starts).astype(jnp.float32)

        def loss_fn(p):
            logits = model.apply_logits(p, x, deterministic=False,
                                        dropout_key=key_dropout,
                                        dropout_rate=hp["dropout"])
            return categorical_crossentropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        opt_state = _set_hyperparams(opt_state, optimizer_name, hp)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: jnp.where(active, u, 0), updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.vmap(one_trial)(params, opt_states, hp, keys, active)


@partial(jax.jit, static_argnames=("model",))
def _parallel_eval(params, x, y, model: DeepGRPModel):
    def one(p):
        logits = model.apply_logits(p, x, deterministic=True)
        return categorical_crossentropy(logits, y)

    return jax.vmap(one)(params)


def run_parallel_trials(base_options: Options,
                        trial_dicts: List[Dict[str, Any]],
                        train_data: Data, val_data: Data,
                        seed: int = 0) -> List[Dict[str, Any]]:
    """Train every trial simultaneously; returns per-trial results.

    Each result: ``{"val_loss": best, "val_history": [...], "params": best
    pytree (host), "stopped_epoch": last active epoch}``.  Early stopping
    is per-trial: a trial whose patience is exhausted is FROZEN (its
    updates are masked to zero on device, so its weights stop moving and
    later validation noise records no spurious improvements), and the
    fleet loop exits as soon as every trial is frozen.  Per improvement
    epoch only the improved trials' parameter slices are fetched.
    """
    n_trials = len(trial_dicts)
    if n_trials == 0:
        return []
    for t in trial_dicts:
        extra = set(t) - set(VARYING_KEYS)
        if extra:
            raise ValueError(
                f"parallel trials can only vary {VARYING_KEYS}, got {extra}")

    options = base_options
    model = create_model(options)
    hp = {k: jnp.asarray(v)
          for k, v in stack_trial_hyperparams(options, trial_dicts).items()}

    key = jax.random.PRNGKey(seed)
    key, *init_keys = jax.random.split(key, n_trials + 1)
    params = jax.vmap(model.init)(jnp.stack(init_keys))

    optimizer = _injected_optimizer(str(options.optimizer))
    opt_states = jax.vmap(optimizer.init)(params)

    train_sampler = BatchSampler(options, train_data)
    val_sampler = BatchSampler(options, val_data)
    sampler_static = (train_sampler.n_sampled_classes,
                      train_sampler.one_class_size,
                      train_sampler.batch_size, train_sampler.seq_len)

    best_val = np.full(n_trials, np.inf)
    # Writable host copies (device_get may return read-only views): the
    # improvement scatter updates trial slices in place.
    best_params = jax.tree.map(np.array, jax.device_get(params))
    history: List[np.ndarray] = []
    # Patience < 1 would freeze every trial before epoch 1's validation
    # is ever recorded (val_loss=inf, untrained params); clamp so the
    # first epoch always counts, matching the sequential driver.
    patience = max(int(options.early_stopping_th), 1)
    since_best = np.zeros(n_trials, np.int32)
    stopped_epoch = np.full(n_trials, 0, np.int64)

    for epoch in range(1, options.n_epochs + 1):
        active_h = since_best < patience
        active = jnp.asarray(active_h)
        for _ in range(options.n_batches):
            key, step_key = jax.random.split(key)
            step_keys = jax.random.split(step_key, n_trials)
            params, opt_states, _ = _parallel_step(
                params, opt_states, hp, step_keys, active,
                train_sampler._fwd, train_sampler._lbl,
                train_sampler._candidates, train_sampler._lengths,
                sampler_static, model, str(options.optimizer),
                int(options.vecsize))
        key, val_key = jax.random.split(key)
        val_x, val_y = val_sampler.batch(val_key)
        val_losses = np.asarray(_parallel_eval(params, val_x, val_y, model))
        history.append(val_losses)
        # Frozen trials record no further improvements (their params no
        # longer move; apparent gains would be validation-batch noise).
        improved = (val_losses < best_val) & active_h
        since_best = np.where(improved, 0, since_best + active_h)
        stopped_epoch = np.where(active_h, epoch, stopped_epoch)
        if improved.any():
            # Fetch ONLY the improved trials' parameter slices (a device
            # gather + subset transfer, not the whole fleet — the fleet
            # pytree is large and the link may be slow).
            idx = np.nonzero(improved)[0]
            idx_d = jnp.asarray(idx)
            sub = jax.device_get(
                jax.tree.map(lambda a: a[idx_d], params))
            best_val = np.where(improved, val_losses, best_val)

            def scatter(b, s):
                b[idx] = s
                return b

            best_params = jax.tree.map(scatter, best_params, sub)
        # Stop when every trial has exhausted its patience.
        if not (since_best < patience).any():
            break

    stacked_history = np.stack(history)
    results = []
    for i in range(n_trials):
        trial_params = jax.tree.map(lambda a, i=i: np.asarray(a[i]),
                                    best_params)
        results.append({
            "val_loss": float(best_val[i]),
            "val_history": stacked_history[:, i].tolist(),
            "params": trial_params,
            "stopped_epoch": int(stopped_epoch[i]),
        })
    return results


