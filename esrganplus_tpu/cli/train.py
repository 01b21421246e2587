"""Training entry point (reference ``codes/train.py`` surface).

    python -m esrganplus_tpu.cli.train -opt path/to/options.json

Covers: PSNR pretraining (``model: "sr"``) and GAN fine-tuning
(``model: "srgan" | "srragan"``), experiment-dir management, dual loggers,
periodic validation with PSNR and saved val images, checkpoint/resume with
optimizer state, reference-layout .pth weight export, optional TensorBoard
scalars. Training is data-parallel over all visible devices.
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import time

import numpy as np


def _export_networks(models_dir, tag, model_kind, state, net_g, net_d,
                     trainer=None):
    from esrganplus_tpu.train.checkpoint import save_networks_pth

    # prepared-trunk trainers keep G masters in the kernel layout; .pth
    # exports are always canonical (models/rrdb.py unprep_trunk_ct)
    to_canon = getattr(trainer, "canonical_params", lambda p: p)
    if model_kind == "sr":
        save_networks_pth(models_dir, tag, to_canon(state["params"]), net_g)
    elif model_kind == "sftgan":
        import torch

        from esrganplus_tpu.models.sft import acd_to_state_dict, sftnet_to_state_dict

        os.makedirs(models_dir, exist_ok=True)

        def dump(sd, name):
            torch.save({k: torch.from_numpy(np.array(v, copy=True))
                        for k, v in sd.items()},
                       os.path.join(models_dir, name))

        dump(sftnet_to_state_dict(state["g_params"], net_g), f"{tag}_G.pth")
        # the reference saves the ACD discriminator too (SFTGAN_ACD_model.py)
        dump(acd_to_state_dict(state["d_params"]), f"{tag}_D.pth")
    else:
        save_networks_pth(models_dir, tag, to_canon(state["g_params"]), net_g,
                          state["d_params"], net_d)


def compute_burst_len(step: int, burst: int, niter: int, freqs, prof_points):
    """Length of the next resident step-burst starting at ``step``.

    Quantised to {burst, 1}: every distinct n_steps value is a separate
    multi-minute XLA compile of the training step, so boundary remainders
    run as single steps against the n_steps=1 executable. Bursts never
    cross a periodic boundary in ``freqs`` (print/val/save/refresh), a
    profiler start/stop point, or ``niter``."""
    n = min(burst, niter - step)
    for f in freqs:
        if f and f > 0:
            n = min(n, f - step % f)
    for p in prof_points:
        if p is not None and step < p:
            n = min(n, p - step)
    return n if n == burst else 1


def _get_tb_writer(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=log_dir)
    except Exception:
        return None


def main(argv=None):
    from esrganplus_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True, help="path to option JSON file")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the steady-state "
                         "training loop into DIR (TensorBoard-loadable)")
    ap.add_argument("--profile-steps", type=int, default=20,
                    help="how many steps to trace (after 10 warmup steps)")
    # multi-host launch (SURVEY §2.9): run one process per host with the
    # same -opt; in the host-fed path `batch_size` becomes PER-PROCESS (the
    # loader interleaves hosts round-robin over one seeded global stream,
    # so a global step consumes num_processes × batch_size distinct
    # samples); in resident mode `batch_size` stays GLOBAL (sampling is
    # on-device inside the SPMD step). Process 0 owns validation output,
    # checkpoints, and the experiment dir.
    ap.add_argument("--dist-coordinator", default=None, metavar="HOST:PORT",
                    help="jax.distributed coordinator address (multi-host)")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    args = ap.parse_args(argv)

    import jax

    if args.dist_coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id)

    from esrganplus_tpu.data import DeviceFeeder, create_dataloader, create_dataset
    from esrganplus_tpu.options.options import (
        build_net_d_config,
        build_net_g_config,
        build_train_config,
        check_resume,
        dict2str,
        parse,
    )
    from esrganplus_tpu.parallel import make_mesh
    from esrganplus_tpu.train.checkpoint import (
        STATE_SUFFIX,
        AsyncCheckpointer,
        load_state_auto,
        save_networks_pth,
    )
    from esrganplus_tpu.ops.image_io import save_img, tensor2img
    from esrganplus_tpu.ops.metrics import calculate_psnr
    from esrganplus_tpu.utils import mkdir_and_rename, set_random_seed, setup_logger

    opt = parse(args.opt, is_train=True)
    # process 0 owns the experiment dir, validation output, and checkpoints;
    # other processes train the same SPMD program and log to rank-tagged files
    is_lead = jax.process_index() == 0
    multi_proc = jax.process_count() > 1
    resume_path = opt["path"].get("resume_state")
    if resume_path:
        check_resume(opt)
    elif is_lead:
        mkdir_and_rename(opt["path"]["experiments_root"])
    if multi_proc:
        # non-lead processes must not race the lead's archival rename
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("experiment-dirs")
    for key in ("models", "training_state", "val_images", "log"):
        os.makedirs(opt["path"][key], exist_ok=True)

    log_tag = "train" if is_lead else f"train_rank{jax.process_index()}"
    logger = setup_logger("base", opt["path"]["log"], log_tag, screen=is_lead)
    logger.info(dict2str(opt))
    tb = _get_tb_writer(os.path.join(opt["path"]["log"], "tb")) \
        if (is_lead and opt.get("use_tb_logger")
            and "debug" not in opt["name"]) else None

    seed = opt["train"].get("manual_seed") or 0
    set_random_seed(seed)

    # ---- data ----
    train_opt_ds = None
    val_ds = None
    for phase, ds_opt in opt["datasets"].items():
        if ds_opt["phase"] == "train":
            train_opt_ds = ds_opt
        elif ds_opt["phase"] == "val":
            val_ds = create_dataset(ds_opt)
    assert train_opt_ds is not None, "no train dataset in options"
    train_ds = create_dataset(train_opt_ds)
    train_loader = create_dataloader(train_ds, train_opt_ds, seed=seed)
    batch_size = train_opt_ds.get("batch_size", 16)
    niter = int(opt["train"].get("niter", 500_000))
    logger.info(f"train images: {len(train_ds)}, batch {batch_size}, iters {niter:,}")

    # ---- mesh / trainer ----
    mesh = make_mesh()
    logger.info(f"devices: {jax.device_count()} ({jax.devices()[0].platform})")
    net_g = build_net_g_config(opt)
    model_kind = opt["model"]
    train_cfg = build_train_config(opt)
    net_d = None
    if model_kind == "sr":
        from esrganplus_tpu.train import SRTrainer

        trainer = SRTrainer(net_g, train_cfg, mesh=mesh)
    elif model_kind == "sftgan":
        from esrganplus_tpu.train.sftgan_model import SFTGANTrainer

        trainer = SFTGANTrainer(net_g, train_cfg, mesh=mesh)
    else:
        from esrganplus_tpu.train.gan_model import GANTrainer

        net_d = build_net_d_config(opt)
        trainer = GANTrainer(net_g, net_d, train_cfg, mesh=mesh)
    if getattr(trainer, "use_feature", False) and not trainer.f_params.get("pretrained"):
        logger.warning("VGG19 weights not provided (path.vgg19); perceptual "
                       "loss uses RANDOM features — supply a torchvision "
                       "vgg19 .pth for real training")
    state = trainer.init_state(jax.random.PRNGKey(seed))

    # ---- pretrained / resume ----
    g_key = "params" if model_kind == "sr" else "g_params"
    if opt["path"].get("pretrain_model_G") and not resume_path:
        from esrganplus_tpu.convert import load_state_dict
        from esrganplus_tpu.convert.pth import generator_from_state_dict
        from esrganplus_tpu.parallel import replicate_tree

        params, _, _ = generator_from_state_dict(load_state_dict(opt["path"]["pretrain_model_G"]), net_g)
        params = getattr(trainer, "ingest_params", lambda p: p)(params)
        state[g_key] = replicate_tree(mesh, params)
        logger.info(f"loaded pretrained G from {opt['path']['pretrain_model_G']}")
    if opt["path"].get("pretrain_model_D") and not resume_path:
        # reference semantics: GAN models load a pretrained D when set
        # (SRGAN_model.py:233, SFTGAN_ACD_model.py:254)
        if model_kind == "sr":
            logger.warning("pretrain_model_D is set but model 'sr' has no "
                           "discriminator — ignored")
        else:
            from esrganplus_tpu.convert import load_state_dict
            from esrganplus_tpu.parallel import replicate_tree

            sd = load_state_dict(opt["path"]["pretrain_model_D"])
            if model_kind == "sftgan":
                from esrganplus_tpu.models.sft import acd_from_state_dict

                d_params = acd_from_state_dict(sd)
            else:
                from esrganplus_tpu.convert.pth import (
                    discriminator_from_state_dict,
                    discriminator_sn_from_state_dict,
                )

                conv_fn = (discriminator_sn_from_state_dict
                           if net_d.spectral_norm
                           else discriminator_from_state_dict)
                d_params = conv_fn(sd, net_d)
            state["d_params"] = replicate_tree(mesh, d_params)
            logger.info(f"loaded pretrained D from {opt['path']['pretrain_model_D']}")
    start_step = 0
    if resume_path:
        # representation-tolerant: a state saved under the other prep_trunk
        # gate (e.g. TPU-trained prepared masters resumed on a CPU trainer)
        # converts exactly — the layouts are permutations of each other.
        state = load_state_auto(resume_path, state, net_g)
        start_step = int(np.asarray(state["step"]))
        logger.info(f"resumed from {resume_path} at step {start_step}")

    # ---- loop ----
    feed_keys = ("LR", "seg", "HR", "category") if model_kind == "sftgan" else ("LR", "HR")
    # datasets.train.resident_crops: N keeps a pool of N aligned crop pairs
    # in HBM and samples/augments each batch ON DEVICE inside the step's jit
    # — removes the per-step host→device transfer entirely (docs/OPTIONS.md)
    resident_n = train_opt_ds.get("resident_crops")
    use_resident = bool(resident_n) and model_kind in ("sr", "srgan",
                                                       "srragan", "sftgan")
    if use_resident:
        from esrganplus_tpu.data.resident import (ResidentCropStore,
                                                  ResidentSegStore)

        store_cls = (ResidentSegStore if model_kind == "sftgan"
                     else ResidentCropStore)
        store = store_cls(
            train_ds, mesh, n_crops=int(resident_n),
            refresh_steps=int(train_opt_ds.get("resident_refresh", 1000)),
            async_refresh=bool(train_opt_ds.get("resident_async_refresh",
                                                True)),
            seed=seed,
            use_flip=train_opt_ds.get("use_flip", True),
            use_rot=train_opt_ds.get("use_rot", True))
        logger.info(f"resident crop store: {store.n_crops} pairs in HBM, "
                    f"refresh every {store.refresh_steps} steps")
        feeder = None
    else:
        feeder = iter(DeviceFeeder(train_loader, mesh, keys=feed_keys))
    print_freq = opt["logger"].get("print_freq", 100)
    val_freq = opt["train"].get("val_freq", 5000)
    save_freq = opt["train"].get("save_checkpoint_freq", 5000)
    # train.steps_per_dispatch (resident mode only): run up to K optimizer
    # steps per device dispatch via a lax.fori_loop burst — amortises the
    # per-step dispatch/RTT on remote-attached runtimes. Bursts never cross
    # a print/val/save/refresh/profile/niter boundary, so all host-side
    # cadences behave identically (only per-step logs inside a burst are
    # skipped — as they already are between print_freq prints).
    burst = max(1, int(opt["train"].get("steps_per_dispatch", 1) or 1)) \
        if use_resident else 1
    rng = jax.random.PRNGKey(seed + 1)
    ckpt = AsyncCheckpointer()
    sharded_eval = None

    # --profile: trace [start+10, start+10+profile_steps) — past compile and
    # feeder warmup so the capture shows the steady-state step.
    prof_start = (start_step + 10 if args.profile and args.profile_steps > 0
                  else None)
    prof_stop = prof_start + args.profile_steps if prof_start is not None else None
    prof_active = False

    def _burst_len(step: int) -> int:
        return compute_burst_len(
            step, burst, niter,
            (print_freq, val_freq, save_freq,
             store.refresh_steps if use_resident else 0),
            (prof_start, prof_stop))

    t_last = time.time()
    step = start_step
    while step < niter:
        if step == prof_start:
            jax.profiler.start_trace(args.profile)
            prof_active = True
            logger.info(f"profiler trace started -> {args.profile}")
        if use_resident:
            store.maybe_refresh(step)
            n_burst = _burst_len(step)
            state, logs = trainer.train_step_resident(state, store, rng,
                                                      batch_size,
                                                      n_steps=n_burst)
            step += n_burst - 1  # the loop tail accounts for one step
        else:
            batch_dev, _ = next(feeder)
            state, logs = trainer.train_step(state, batch_dev, rng)
        if prof_active and step + 1 >= prof_stop:
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), logs)
            jax.profiler.stop_trace()
            prof_active = False
            logger.info(f"profiler trace written to {args.profile} "
                        f"(view: tensorboard --logdir {args.profile})")

        if (step + 1) % print_freq == 0:
            logs_h = {k: float(v) for k, v in logs.items()}
            dt = (time.time() - t_last) / print_freq
            t_last = time.time()
            msg = f"<step:{step + 1:8,d}, {dt*1000:6.1f} ms/it> " + " ".join(
                f"{k}: {v:.4e}" for k, v in logs_h.items())
            logger.info(msg)
            if tb:
                for k, v in logs_h.items():
                    tb.add_scalar(k, v, step + 1)

        if val_ds is not None and (step + 1) % val_freq == 0:
            g_params = state[g_key]
            psnrs = []
            scale = net_g.upscale
            # shard validation images across the mesh's data axis (SFT rides
            # its HR-scale seg maps along as the evaluator's side input).
            # eval_sharded: false forces the sequential whole-image protocol —
            # padded/sharded eval is interior-exact but not bit-identical at
            # pad borders (docs/OPTIONS.md "Validation border caveat").
            if (mesh.shape["data"] > 1 and not multi_proc
                    and opt.get("eval_sharded") is not False):
                if sharded_eval is None:
                    from esrganplus_tpu.infer import ShardedEvaluator

                    if model_kind == "sftgan":
                        import functools as _ft

                        from esrganplus_tpu.models.sft import sftnet_forward

                        sharded_eval = ShardedEvaluator(
                            net_g, mesh,
                            fwd_fn=_ft.partial(sftnet_forward, cfg=net_g),
                            side_scale=net_g.upscale)
                    else:
                        sharded_eval = ShardedEvaluator(net_g, mesh,
                                                        dtype=trainer._dtype)
                samples = [val_ds[i] for i in range(len(val_ds))]
                srs = sharded_eval.upscale_batch(
                    g_params, [s["LR"] for s in samples],
                    sides=([s["seg"] for s in samples]
                           if model_kind == "sftgan" else None))
                results = zip(samples, srs)
            else:
                def _seq():
                    for sample in val_ds:
                        lr_img = sample["LR"][None]
                        if model_kind == "sftgan":
                            yield sample, np.asarray(trainer.predict(
                                g_params, lr_img, sample["seg"][None]))[0]
                        else:
                            yield sample, np.asarray(trainer.predict(g_params, lr_img))[0]

                results = _seq()
            for sample, sr in results:
                sr_img = tensor2img(sr)
                gt_img = tensor2img(sample["HR"])
                base = os.path.splitext(os.path.basename(sample["HR_path"]))[0]
                img_dir = os.path.join(opt["path"]["val_images"], base)
                if is_lead:
                    os.makedirs(img_dir, exist_ok=True)
                    save_img(sr_img, os.path.join(img_dir, f"{base}_{step + 1}.png"))
                c = scale
                psnrs.append(calculate_psnr(
                    sr_img[c:-c, c:-c].astype(np.float64),
                    gt_img[c:-c, c:-c].astype(np.float64)))
            mean_psnr = float(np.mean(psnrs))
            logger.info(f"# Validation # PSNR: {mean_psnr:.4e}")
            if tb:
                tb.add_scalar("val_psnr", mean_psnr, step + 1)

        if (step + 1) % save_freq == 0 and is_lead:
            logger.info("Saving models and training states.")
            tag = step + 1
            # async: snapshot on device now, fetch+write in the background —
            # the D2H fetch is the slow path on remote-attached runtimes and
            # used to stall the step loop for its whole duration
            ckpt.save(
                os.path.join(opt["path"]["training_state"], f"{tag}{STATE_SUFFIX}"),
                state,
                export_fn=lambda snap, tag=tag: _export_networks(
                    opt["path"]["models"], tag, model_kind, snap, net_g,
                    net_d, trainer=trainer))
        step += 1

    if prof_active:
        # the profile window extended past niter — close it so the trace
        # is written rather than lost
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), logs)
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {args.profile} (run ended "
                    f"inside the profile window)")
    if is_lead:
        ckpt.wait()  # flush any in-flight periodic save before the final one
        logger.info("Saving the final model.")
        _export_networks(opt["path"]["models"], "latest", model_kind, state, net_g, net_d,
                         trainer=trainer)
    logger.info("End of training.")
    if hasattr(train_loader, "stop"):
        train_loader.stop()


if __name__ == "__main__":
    main()
