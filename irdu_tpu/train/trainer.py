"""Config-driven trainer — the finished version of the story the
reference's `run_train.py` starts but never completes (it builds the
dataloader then `return None`; the real training lives in 12 hard-coded
scripts). Here every experiment in the reference's script table
(SURVEY.md §2.7) is a YAML config driving this one loop.

Loop shape mirrors the reference trainers: progressive patch-size stages
chained per epoch, per-100-iter rolling PSNR logs, periodic checkpoints
with auto-resume (including mid-stage data position), periodic
benchmark-protocol eval.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.data.dataset import PatchDataset
from irdu_tpu.data.loader import batched_loader, device_prefetch
from irdu_tpu.eval.harness import evaluate_pairs, load_benchmark_images
from irdu_tpu.models.registry import create_model
from irdu_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from irdu_tpu.train.checkpoints import CheckpointManager
from irdu_tpu.train.schedules import flagship_lr_schedule, multistep_then_cosine, multistep_schedule
from irdu_tpu.train.steps import create_train_state, make_eval_forward, make_train_step
from irdu_tpu.utils.config import pretty_config
from irdu_tpu.utils.logging import get_root_logger
from irdu_tpu.utils.profiling import enable_compile_cache
from irdu_tpu.utils.seeding import set_random_seed


def build_schedule(conf: dict):
    kind = conf.get("type", "flagship")
    # `step_offset` shifts the whole scheme: a run warm-started from a
    # step-S snapshot (whose orbax state died with an environment reset)
    # continues the reference LR trajectory at step S instead of
    # restarting at the 4e-4 head (VERDICT r3 #5 continuation runs).
    off = int(conf.get("step_offset", 0))
    if off:
        inner = build_schedule({k: v for k, v in conf.items()
                                if k != "step_offset"})
        return lambda step: inner(step + off)
    if kind == "flagship":
        return flagship_lr_schedule()
    if kind == "multistep":
        return multistep_schedule(conf["base_lr"], conf["milestones"], conf.get("gamma", 0.5))
    if kind == "multistep_then_cosine":
        return multistep_then_cosine(
            conf["base_lr"], conf["milestones"], conf["gamma"], conf["switch_step"],
            conf["cosine_base_lr"], conf["cosine_t_max"], conf.get("eta_min", 1e-6),
        )
    if kind == "constant":
        return lambda step: conf["base_lr"]
    raise ValueError(f"unknown schedule type {kind}")


class Trainer:
    def __init__(self, config: dict[str, Any], workdir: str | None = None):
        self.config = config
        self.name = config["name"]
        self.workdir = workdir or os.path.join(
            config.get("path", {}).get("root_dir", "experiments"), self.name
        )
        os.makedirs(self.workdir, exist_ok=True)
        self.logger = get_root_logger(
            f"irdu.{self.name}", log_file=os.path.join(self.workdir, "train.log")
        )
        self.logger.info("config:\n%s", pretty_config(config))

        # Stage transitions recompile the train step per patch shape; through
        # this rig's remote-compile tunnel a cold flagship compile is minutes.
        # The repo-local persistent cache turns every re-run/resume into a
        # seconds-long restore (same cache bench.py and __graft_entry__ ride).
        enable_compile_cache()

        self.rng = set_random_seed(config.get("manual_seed", 2204))

        model_conf = dict(config["model"])
        self.model = create_model(model_conf.pop("type"), **model_conf)

        par_conf = config.get("parallel", {})
        n_dp = par_conf.get("data_parallel", "auto")
        n_tp = par_conf.get("tensor_parallel", 1)
        devices = jax.devices()
        if n_dp == "auto":
            n_dp = max(1, len(devices) // n_tp)
        self._state_shardings = None
        if n_tp > 1:
            # dp×tp/ep 2-D mesh: gated-block hidden dims Megatron-sharded,
            # solver graph hypotheses expert-sharded (parallel/tensor.py).
            from irdu_tpu.parallel.tensor import (
                check_tp_divisibility, make_dp_tp_mesh)

            if hasattr(self.model, "hidden_dims"):
                check_tp_divisibility(self.model, n_tp)
            self.mesh = make_dp_tp_mesh(devices[: n_dp * n_tp], tp=n_tp)
        else:
            self.mesh = make_mesh(devices[:n_dp]) if n_dp > 1 else None
        self._tp = n_tp

        tc = config["train"]
        schedule = build_schedule(tc.get("schedule", {"type": "flagship"}))
        stage0 = tc["stages"][0]
        example = np.zeros(
            (stage0["batch_size"], stage0["patch_size"], stage0["patch_size"], 3),
            np.float32,
        )
        self.rng, init_rng = jax.random.split(self.rng)
        self.state = create_train_state(self.model, init_rng, example, schedule)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.state.params))
        self.logger.info("Init model with total parameters: %d", n_params)
        if self._tp > 1:
            from irdu_tpu.parallel.tensor import (
                shard_train_state, train_state_shardings)

            self.state = shard_train_state(self.state, self.mesh)
            self._state_shardings = train_state_shardings(self.state, self.mesh)

        distill = tc.get("distill")
        if distill:
            # Knowledge distillation: a frozen teacher (any registry model +
            # npz weight snapshot) adds an L1(student, teacher(noisy)) term.
            # Config block:
            #   train.distill: {model: {...}, weights: path,
            #                   weight: 1.0, dtype: bfloat16}
            from irdu_tpu.train.steps import make_distill_train_step
            from irdu_tpu.utils.weights import load_params_npz

            t_conf = dict(distill["model"])
            self.teacher_model = create_model(t_conf.pop("type"), **t_conf)
            t_dtype = getattr(jnp, distill.get("dtype", "bfloat16"))
            self.teacher_params = load_params_npz(distill["weights"],
                                                  dtype=t_dtype)
            if self.mesh is not None:
                from irdu_tpu.parallel.mesh import replicated_sharding

                self.teacher_params = jax.device_put(
                    self.teacher_params, replicated_sharding(self.mesh))
            self.logger.info("distilling from %s (weight=%.3g)",
                             distill["weights"], distill.get("weight", 1.0))
            distill_step = make_distill_train_step(
                self.model,
                self.teacher_model,
                self.mesh,
                distill_weight=distill.get("weight", 1.0),
                use_aux_losses=tc.get("use_aux_losses", True),
                loss02_weight=tc.get("loss02_weight", 0.1),
                loss03_weight=tc.get("loss03_weight", 0.5),
                state_shardings=self._state_shardings,
            )
            self.train_step = (
                lambda state, noisy, clean, rng: distill_step(
                    state, self.teacher_params, noisy, clean, rng))
        else:
            self.train_step = make_train_step(
                self.model,
                self.mesh,
                use_aux_losses=tc.get("use_aux_losses", True),
                loss02_weight=tc.get("loss02_weight", 0.1),
                loss03_weight=tc.get("loss03_weight", 0.5),
                state_shardings=self._state_shardings,
            )

        self.ckpt = CheckpointManager(
            os.path.join(self.workdir, "checkpoints"),
            max_to_keep=tc.get("keep_checkpoints", 5),
        )
        self.state, self.data_state = self.ckpt.restore(self.state)
        if self.data_state:
            # Resume sanity (VERDICT r3 weak #6): a restored run must not
            # silently restart from scratch — the optimizer step and the
            # loader position both have to have moved.
            assert int(self.state.step) > 0, (
                "resume restored data_state but state.step == 0 — "
                "checkpoint restore returned a fresh train state")
            self.logger.info("Resumed from step %d", int(self.state.step))
            if self._tp > 1:
                from irdu_tpu.parallel.tensor import shard_train_state

                self.state = shard_train_state(self.state, self.mesh)

        # Per-stage remat override (train.stages[i].remat): a 128^2 stage
        # fits HBM without per-block remat at ~3.5x the step rate, while
        # 192^2+ stages need it (PERF.md) — long runs put the bulk of their
        # steps in a no-remat first stage. Cache of train steps per flag.
        self._step_cache: dict[bool, Any] = {}
        self._distilling = bool(distill)

        self.verbose_rate = tc.get("verbose_rate", 100)
        self.ckpt_rate = tc.get("checkpoint_rate", 5000)
        self.eval_rate = tc.get("eval_rate", 1000)
        # One jitted forward taking params as an argument, shared across all
        # periodic evals — a fresh closure per eval would retrace/recompile
        # the full model every time (ADVICE r1).
        self._eval_fwd = jax.jit(self.model.apply)

    def _train_step_for(self, remat: bool | None):
        """Train step honouring a stage's `remat` override. `None` (no
        override) or a distillation run returns the default step; otherwise
        a model variant with `remat` flipped is built once and its step
        cached (params trees are identical across remat variants — the
        wrapper only changes the autodiff graph, so state carries over)."""
        if remat is None:
            return self.train_step
        if self._distilling:
            # Distillation builds its own composite step; per-stage remat
            # overrides are not plumbed through it, so say so instead of
            # silently running with the default (ADVICE r3 #4).
            if bool(remat) != bool(self.config["model"].get("remat", False)):
                self.logger.warning(
                    "stage remat=%s override ignored: distillation runs use "
                    "the model default remat=%s", remat,
                    self.config["model"].get("remat", False))
            return self.train_step
        key = bool(remat)
        if key == bool(self.config["model"].get("remat", False)):
            return self.train_step
        if key not in self._step_cache:
            mc = dict(self.config["model"])
            mc["remat"] = key
            model = create_model(mc.pop("type"), **mc)
            tc = self.config["train"]
            self._step_cache[key] = make_train_step(
                model,
                self.mesh,
                use_aux_losses=tc.get("use_aux_losses", True),
                loss02_weight=tc.get("loss02_weight", 0.1),
                loss03_weight=tc.get("loss03_weight", 0.5),
                state_shardings=self._state_shardings,
            )
        return self._step_cache[key]

    # -- data ------------------------------------------------------------

    def _stage_dataset(self, stage: dict, epoch: int) -> PatchDataset:
        dc = dict(self.config["datasets"]["train"])
        lam = dc.get("lambda_noise", 25.0)
        if isinstance(lam, list):  # vary_addictive_noise: [levels, probs]
            lam = (lam[0], lam[1])
        extras = {k: dc[k] for k in ("sampling", "patch_overlap_size", "clip_noisy")
                  if k in dc}
        if "patch_overlap_size" in extras:
            extras["patch_overlap_size"] = tuple(extras["patch_overlap_size"])
        ds = PatchDataset(
            csv_path=dc["csv_path"],
            root_folder=dc["root_folder"],
            patch_size=(stage["patch_size"], stage["patch_size"]),
            max_num_patchs=stage.get("max_num_patchs", 100000),
            dist_mode=dc.get("dist_mode", "addictive_noise_scale"),
            lambda_noise=lam,
            use_data_aug=dc.get("use_data_aug", True),
            seed=dc.get("seed", 2204) + epoch,
            **extras,
        )
        return ds

    # -- eval ------------------------------------------------------------

    def run_eval(self) -> dict[str, float]:
        results = {}
        eval_conf = self.config.get("eval")
        if not eval_conf:
            return results
        params = self.state.params
        forward = lambda x: self._eval_fwd(params, x)  # noqa: E731
        for name, spec in eval_conf.get("datasets", {}).items():
            images = load_benchmark_images(spec["csv_path"], spec["root_folder"])
            out = evaluate_pairs(
                forward, images, eval_conf.get("sigma", 25.0),
                bucket=eval_conf.get("bucket"),
            )
            results[name] = out["mean_psnr"]
            self.logger.info(
                "FINISH VAL step=%d dataset=%s psnr_testing=%.4f",
                int(self.state.step), name, out["mean_psnr"],
            )
        return results

    # -- loop ------------------------------------------------------------

    def run(self) -> dict:
        tc = self.config["train"]
        num_epochs = tc.get("num_epochs", 1)
        max_steps = tc.get("max_steps")
        psnr_hist, mse_hist = [], []
        start_epoch = (self.data_state or {}).get("epoch", 0)
        start_stage = (self.data_state or {}).get("stage", 0)
        skip = (self.data_state or {}).get("offset", 0)

        i = int(self.state.step)
        for epoch in range(num_epochs):
            if epoch < start_epoch:
                continue
            for stage_idx, stage in enumerate(tc["stages"]):
                if epoch == start_epoch and stage_idx < start_stage:
                    continue
                ds = self._stage_dataset(stage, epoch)
                step_fn = self._train_step_for(stage.get("remat"))
                # index-only fast-forward on resume: identical batches to a
                # materializing replay (per-(seed,idx) item RNG) at zero
                # loader cost — a late-stage resume would otherwise replay
                # for hours (loader ~0.2 s/batch).
                skip_here = (skip if (epoch == start_epoch
                                      and stage_idx == start_stage) else 0)
                loader = batched_loader(ds, stage["batch_size"],
                                        skip_batches=skip_here)
                if self.mesh is not None:
                    loader = device_prefetch(loader, sharding=batch_sharding(self.mesh))
                else:
                    loader = device_prefetch(loader)
                offset = skip_here
                for noisy, clean in loader:
                    offset += 1
                    t0 = time.time()
                    self.rng, step_rng = jax.random.split(self.rng)
                    self.state, metrics = step_fn(self.state, noisy, clean, step_rng)
                    i += 1
                    if i % self.verbose_rate == 0:
                        m = jax.device_get(metrics)
                        psnr_hist.append(float(m["psnr"]))
                        mse_hist.append(float(m["mse"]))
                        self.logger.info(
                            "iter=%d time=%.3f psnr=%.4f mse=%.6f",
                            i, time.time() - t0,
                            float(np.mean(psnr_hist[-100:])),
                            float(np.mean(mse_hist[-100:])),
                        )
                    if self.ckpt_rate and i % self.ckpt_rate == 0:
                        self.ckpt.save(i, self.state,
                                       {"epoch": epoch, "stage": stage_idx,
                                        "offset": offset})
                    if self.eval_rate and i % self.eval_rate == 0:
                        self.run_eval()
                    if max_steps and i >= max_steps:
                        self.ckpt.save(i, self.state,
                                       {"epoch": epoch, "stage": stage_idx,
                                        "offset": offset})
                        self.ckpt.wait()
                        return {"step": i}
        # epoch == num_epochs marks the run complete: a resume skips every
        # epoch and falls straight through instead of replaying the last stage
        self.ckpt.save(i, self.state, {"epoch": num_epochs, "stage": 0, "offset": 0})
        self.ckpt.wait()
        return {"step": i}
