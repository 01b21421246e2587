"""Shared executor for resident-store training steps.

One implementation of the sample-inside-the-jit step (and its
``lax.fori_loop`` burst variant) used by SRTrainer, GANTrainer and
SFTGANTrainer — the trainers differ only in their ``_step`` and in how many
pool tensors the store holds. Every step folds the caller's base rng by the
on-device ``state["step"]`` and splits it into (sampling, noise) keys, so a
burst of N reproduces N single calls' key schedule exactly.
"""

from __future__ import annotations

import jax

from esrganplus_tpu.parallel import replicated


def _build(step_fn, sample, mesh, n_pools: int, n_steps: int):
    rep = replicated(mesh)

    def one(state, pools, rng):
        ks, kn = jax.random.split(jax.random.fold_in(rng, state["step"]))
        return step_fn(state, sample(ks, *pools), kn)

    def run(state, *args):
        pools, rng = args[:-1], args[-1]
        s0, logs0 = one(state, pools, rng)
        if n_steps == 1:
            return s0, logs0

        def body(_, carry):
            s, _ = carry
            return one(s, pools, rng)

        return jax.lax.fori_loop(1, n_steps, body, (s0, logs0))

    return jax.jit(run, in_shardings=(rep,) * (n_pools + 2),
                   out_shardings=(rep, rep), donate_argnums=(0,))


def train_step_resident(trainer, state, store, rng, batch_size: int,
                        n_steps: int, pools):
    """``n_steps`` optimizer steps in ONE dispatch, batches sampled ON
    DEVICE from ``store`` (no per-step host↔device transfer; measured on
    v5e the fused step runs at the pure-step time where host feeding costs
    2.5× through a remote tunnel). Returns the LAST step's logs. Jitted
    executables cache on ``trainer._resident_jits`` keyed by the shapes
    that change the program."""
    key = (batch_size, n_steps, store.n_crops, store.use_flip,
           store.use_rot)
    fn = trainer._resident_jits.get(key)
    if fn is None:
        fn = _build(trainer._step, store.make_sampler(batch_size),
                    trainer.mesh, len(pools), n_steps)
        trainer._resident_jits[key] = fn
    return fn(state, *pools, rng)
