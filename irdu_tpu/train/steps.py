"""Jitted training/eval steps with data-parallel sharding.

The flagship training objective (reference scripts_v2/run_abtract_
lightformer_GGTV_GGLR_sigma25.py:186-210):

  L = L1(model(noisy), clean)
    + 0.1 · MSE(dec(enc(clean)), clean)                (autoencoder consistency)
    + 0.5 · MSE(dec(enc(clean)), dec(enc(clean)+ξ)),   ξ ~ N(0, 0.05) per scale
                                                       (latent robustness)

DP story: params replicated, batch sharded over a 1-D mesh; the step is
jit-compiled with explicit NamedShardings so XLA inserts the gradient
all-reduce over ICI (the TPU-native counterpart of DDP+NCCL, which the
reference lacks entirely — SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from irdu_tpu.parallel.mesh import batch_sharding, replicated_sharding


class TrainState(train_state.TrainState):
    pass


def create_train_state(model, rng, example_input, schedule, *, eps: float = 1e-8):
    # jit the init: eager-mode init dispatches hundreds of tiny ops, which is
    # minutes-slow through a remote-compile TPU backend.
    params = jax.jit(model.init)(rng, example_input)
    tx = optax.adam(learning_rate=schedule, eps=eps)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def flagship_loss(
    model,
    params,
    noisy: jnp.ndarray,
    clean: jnp.ndarray,
    rng: jax.Array,
    *,
    loss02_weight: float = 0.1,
    loss03_weight: float = 0.5,
    latent_noise_std: float = 0.05,
    use_aux_losses: bool = True,
):
    denoised = model.apply(params, noisy)
    loss = jnp.mean(jnp.abs(denoised - clean))
    if use_aux_losses:
        latent = model.apply(params, clean, method="encode")
        recon = model.apply(params, latent, method="decode")
        keys = jax.random.split(rng, len(latent))
        disturbed = tuple(
            l + latent_noise_std * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(latent, keys)
        )
        recon_disturbed = model.apply(params, disturbed, method="decode")
        loss = loss + loss02_weight * jnp.mean(jnp.square(recon - clean))
        loss = loss + loss03_weight * jnp.mean(jnp.square(recon - recon_disturbed))
    return loss, denoised


def make_train_step(
    model,
    mesh=None,
    *,
    use_aux_losses: bool = True,
    loss02_weight: float = 0.1,
    loss03_weight: float = 0.5,
    latent_noise_std: float = 0.05,
    donate: bool = True,
    state_shardings=None,
) -> Callable:
    """Build the jitted train step. With a mesh, inputs are expected
    batch-sharded and the state replicated; XLA inserts the psum.

    state_shardings: optional TrainState-shaped pytree of NamedShardings
    (parallel.tensor.train_state_shardings) for dp×tp/ep runs — params
    and optimizer moments sharded over the "model" axis, batch over
    "data"; GSPMD propagates and inserts the per-block all-reduces."""

    def step(state: TrainState, noisy, clean, rng):
        def loss_fn(params):
            return flagship_loss(
                model, params, noisy, clean, rng,
                loss02_weight=loss02_weight,
                loss03_weight=loss03_weight,
                latent_noise_std=latent_noise_std,
                use_aux_losses=use_aux_losses,
            )

        (loss, denoised), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        # train-log metric (reference :212-217): clipped-PSNR of the batch
        mse = jnp.mean(jnp.square(
            jnp.clip(clean, 0.0, 1.0) - jnp.clip(denoised, 0.0, 1.0)
        ))
        psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
        metrics = {"loss": loss, "mse": mse, "psnr": psnr}
        return state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    batch = batch_sharding(mesh)
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        step,
        in_shardings=(state_sh, batch, batch, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_distill_train_step(
    model,
    teacher_model,
    mesh=None,
    *,
    distill_weight: float = 1.0,
    use_aux_losses: bool = True,
    loss02_weight: float = 0.1,
    loss03_weight: float = 0.5,
    latent_noise_std: float = 0.05,
    donate: bool = True,
    state_shardings=None,
) -> Callable:
    """Train step with knowledge distillation from a frozen teacher.

    Objective = flagship loss + `distill_weight` · L1(student, teacher(noisy)).
    The teacher runs inference-only inside the same jit (stop-gradient), so
    one dispatch covers teacher forward + student forward/backward and XLA
    can overlap them. `teacher_params` is an ARGUMENT of the jitted step —
    array-valued closure constants inside grad graphs trigger pathological
    compiles on this backend (CLAUDE.md).

    The reference has no distillation (SURVEY §2.7); this is a deployment
    lever for the PSNR-vs-throughput curve: small configs trained under a
    large trained flagship recover part of the quality gap at unchanged
    inference cost.
    """

    def step(state: TrainState, teacher_params, noisy, clean, rng):
        # Teacher snapshots are typically bf16 (the inference fast path);
        # match the input dtype to the params (conv rejects mixed dtypes).
        t_dtype = jax.tree_util.tree_leaves(teacher_params)[0].dtype
        teacher_out = jax.lax.stop_gradient(
            teacher_model.apply(teacher_params, noisy.astype(t_dtype))
        ).astype(clean.dtype)

        def loss_fn(params):
            loss, denoised = flagship_loss(
                model, params, noisy, clean, rng,
                loss02_weight=loss02_weight,
                loss03_weight=loss03_weight,
                latent_noise_std=latent_noise_std,
                use_aux_losses=use_aux_losses,
            )
            loss = loss + distill_weight * jnp.mean(
                jnp.abs(denoised - teacher_out))
            return loss, denoised

        (loss, denoised), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads)
        mse = jnp.mean(jnp.square(
            jnp.clip(clean, 0.0, 1.0) - jnp.clip(denoised, 0.0, 1.0)
        ))
        psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
        metrics = {"loss": loss, "mse": mse, "psnr": psnr}
        return state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    batch = batch_sharding(mesh)
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        step,
        in_shardings=(state_sh, repl, batch, batch, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_forward(model, params) -> Callable:
    """(1,H,W,3) float32 -> (1,H,W,3); jit per shape (the eval harness
    buckets shapes to bound recompiles)."""

    @jax.jit
    def forward(x):
        return model.apply(params, x)

    return forward


def stack_of_shapes(datasets: Sequence) -> list:
    return [d.patch_size for d in datasets]
