#!/usr/bin/env python
"""Adversarial domain-adaptation training (tools/train_da_ms.py:83-311).

Trains a multi-scale CMS HRNet on a labelled source domain (synthetic)
while a resnet34 discriminator pushes its heatmaps to be indistinguishable
from an unlabelled target domain (lightbox/sunlamp real imagery). One
jitted step covers both optimizer phases (train/adversarial.py).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="lightbox_cms")
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--train-json", required=True, help="source-domain COCO json")
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--target-json", required=True, help="target-domain COCO json")
    ap.add_argument("--target-image-dir", required=True)
    ap.add_argument("--val-json", default=None)
    ap.add_argument("--output", default="output/da")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("train_landmarks_da")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu import config as C
    from spacecraft_pose_estimation_tpu.data import augment as aug
    from spacecraft_pose_estimation_tpu.data.landmark_dataset import (
        LandmarkExamples,
        batch_iterator,
        device_transform,
        sample_augmentation,
    )
    from spacecraft_pose_estimation_tpu.models import (
        MultiScaleDiscriminator,
        build_landmark_model,
    )
    from spacecraft_pose_estimation_tpu.ops import heatmap as hm_ops
    from spacecraft_pose_estimation_tpu.ops.geometry import (
        apply_affine,
        bbox_to_center_scale,
        crop_affine_matrix,
    )
    from spacecraft_pose_estimation_tpu.ops.warp import batched_crop_and_resize
    from spacecraft_pose_estimation_tpu.pipeline import normalize_crops
    from spacecraft_pose_estimation_tpu.train.adversarial import DAState, make_da_train_step
    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.metrics import JSONWriter, MetricStorage
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer, multistep_schedule

    cfg = C.get_preset(args.preset)
    if args.cfg:
        cfg = C.load_yaml(cfg, args.cfg)
    cfg = C.apply_overrides(cfg, args.opts)

    source = LandmarkExamples(args.train_json, args.image_dir)
    target = LandmarkExamples(args.target_json, args.target_image_dir)
    num_joints = source.num_joints

    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    model = build_landmark_model(cfg.model.name, num_joints, dtype=dtype)
    disc = MultiScaleDiscriminator()

    img_w, img_h = cfg.model.image_size
    x0 = jnp.zeros((1, img_h, img_w, 3))
    mvars = model.init(jax.random.key(cfg.seed), x0, train=True)
    outs, _ = model.apply(mvars, x0, train=True, mutable=["batch_stats"])
    if not isinstance(outs, (tuple, list)):
        raise SystemExit("DA training requires a multi-scale model (hrnet_cms*)")
    dvars = disc.init(jax.random.key(cfg.seed + 1), *outs, train=True)

    bs, bt = cfg.train.batch_size_per_chip, cfg.train.batch_size_adversarial
    steps_per_epoch = max(len(source) // bs, 1)
    milestones = [m * steps_per_epoch for m in cfg.train.lr_step]
    gen_tx = build_optimizer(
        cfg.train.optimizer, multistep_schedule(cfg.train.lr, milestones, cfg.train.lr_factor),
        weight_decay=cfg.train.wd,
    )
    # the reference drives optimizer2 with the SAME MultiStepLR schedule
    # as the generator (train_da_ms.py:257-273)
    disc_tx = build_optimizer(
        "adam", multistep_schedule(cfg.train.lr, milestones, cfg.train.lr_factor)
    )
    state = DAState.create(model, mvars, disc, dvars, gen_tx, disc_tx)

    step = jax.jit(make_da_train_step(beta=cfg.train.beta, d_loss_mode=cfg.train.d_loss_mode))
    mgr = CheckpointManager(os.path.join(args.output, "checkpoints"))
    # full DA payload (generator + discriminator + both optimizer states)
    # for AUTO_RESUME (train_da_ms.py:240-251); the generator-only
    # TrainState export in `checkpoints/` stays the eval contract
    mgr_da = CheckpointManager(os.path.join(args.output, "da_state"), max_to_keep=2)

    def da_payload(st):
        return {
            "step": st.step,
            "gen_params": st.gen_params, "gen_stats": st.gen_stats,
            "disc_params": st.disc_params, "disc_stats": st.disc_stats,
            "gen_opt": st.gen_opt, "disc_opt": st.disc_opt,
        }

    begin_epoch = cfg.train.begin_epoch
    resumed = mgr_da.restore(da_payload(state))
    if resumed is not None:
        payload, meta, _step = resumed
        state = state.replace(**payload)
        begin_epoch = int(meta.get("epoch", -1)) + 1
        logger.info("auto-resumed at epoch %d (step %d)", begin_epoch, int(state.step))

    val_examples = LandmarkExamples(args.val_json, args.target_image_dir) if args.val_json else None
    storage = MetricStorage()
    writer = JSONWriter(os.path.join(args.output, "metrics.json"))

    src_iter = batch_iterator(source, bs, seed=cfg.seed)
    tgt_iter = batch_iterator(target, bt, seed=cfg.seed + 1)
    base_key = jax.random.key(cfg.seed + 2)

    image_size = tuple(cfg.model.image_size)
    hm_size = tuple(cfg.model.heatmap_size)

    def prepare(raw, key, train):
        return device_transform(
            jnp.asarray(raw["image"]), jnp.asarray(raw["bbox"]),
            jnp.asarray(raw["joints"]), jnp.asarray(raw["joints_vis"]), key,
            image_size=image_size, heatmap_size=hm_size, sigma=cfg.model.sigma,
            train=train, scale_factor=cfg.dataset.scale_factor,
            rot_factor=cfg.dataset.rot_factor,
        )

    # per-domain photometric source augs (train_da_ms.py:146-166):
    # ColorJitter(b=c=s=1) -> RandomNoise[0,1] -> erase-to-black
    # (pre-normalize black == the reference's normalized -mean/std value;
    # hue jitter and the sunlamp second white-erase are approximated)
    if "sunlamp" in args.preset:
        noise_std, noise_mean, erase_p = (0.03, 0.05), (0.01, 0.1), 0.3
    else:  # lightbox + default
        noise_std, noise_mean, erase_p = (0.01, 0.1), (0.03, 0.25), 0.4

    def photo_aug(k, im):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        im = aug.color_jitter(k1, im, 1.0, 1.0, 1.0)
        im01 = aug.random_noise_01(k2, im / 255.0, noise_std, noise_mean)
        im = im01 * 255.0
        return jnp.where(
            jax.random.uniform(k3) < erase_p, aug.random_erasing(k4, im), im
        )

    def multi_scale_targets(raw, key):
        """The 4 per-scale CMS targets (JointsDataset multi_scale_target)
        with the reference's train-mode geometry (random scale/rot,
        JointsDataset.py:158-170) and photometric source stack."""
        b = raw["image"].shape[0]
        kg, kp = jax.random.split(key)
        centers, scales = jax.vmap(bbox_to_center_scale)(jnp.asarray(raw["bbox"]))
        s_mult, rots = sample_augmentation(
            kg, b, cfg.dataset.scale_factor, cfg.dataset.rot_factor
        )
        scales = scales * s_mult[:, None]
        crops = batched_crop_and_resize(
            jnp.asarray(raw["image"]), centers, scales, rots, image_size
        )
        crops = jax.vmap(photo_aug)(jax.random.split(kp, b), crops)
        joints = jax.vmap(
            lambda jts, c, s, r: apply_affine(jts, crop_affine_matrix(c, s, r, image_size))
        )(jnp.asarray(raw["joints"]), centers, scales, rots)
        batch = {"source_image": normalize_crops(crops)}
        # per-scale sigmas SIGMA/SIGMA2/SIGMA3/SIGMA4
        # (JointsDataset.generate_target, :279-285)
        sigmas = [cfg.model.sigma, cfg.model.sigma2, cfg.model.sigma3, cfg.model.sigma4]
        for idx, div in enumerate([1, 2, 4, 8]):
            tgt, tw = jax.vmap(
                lambda jt, v, d=div, sg=sigmas[idx]: hm_ops.generate_target(
                    jt, v, image_size, (hm_size[0] // d, hm_size[1] // d), sg
                )
            )(joints, jnp.asarray(raw["joints_vis"]))
            suffix = "" if idx == 0 else str(idx + 1)
            batch[f"target{suffix}"] = tgt
            batch[f"target_weight{suffix}"] = tw
        return batch

    total_steps = cfg.train.end_epoch * steps_per_epoch
    for epoch in range(begin_epoch, cfg.train.end_epoch):
        for i in range(steps_per_epoch):
            key = jax.random.fold_in(base_key, int(state.step))
            src_raw = next(src_iter)
            tgt_raw = next(tgt_iter)
            batch = multi_scale_targets(src_raw, key)
            tgt_prep = prepare(tgt_raw, jax.random.fold_in(key, 1), train=True)
            batch["target_image"] = tgt_prep["image"]
            state, metrics = step(state, batch)
            storage.step = int(state.step)
            storage.put_scalars(**{k: float(v) for k, v in metrics.items()})
            if (i + 1) % cfg.print_freq == 0:
                logger.info(
                    "epoch %d step %d loss %.5f d_loss %.5f",
                    epoch, int(state.step), storage.avg("loss"), storage.avg("d_loss"),
                )
        writer.write(storage)
        gen_state = _as_train_state(state, model)
        mgr.save(int(state.step), gen_state, {"epoch": epoch})
        mgr_da.save(int(state.step), da_payload(state), {"epoch": epoch})
        # validate on the target domain every 5 epochs
        # (train_da_ms.py:277-288)
        if val_examples is not None and (
            (epoch + 1) % 5 == 0 or epoch == cfg.train.end_epoch - 1
        ):
            from spacecraft_pose_estimation_tpu.train import landmark_loop

            preds = landmark_loop.validate(
                model,
                {"params": state.gen_params, "batch_stats": state.gen_stats},
                val_examples,
                cfg.test.batch_size_per_chip,
                tuple(cfg.model.image_size),
                output_path=os.path.join(args.output, "pred_val_real.mat"),
                flip_test=cfg.test.flip_test,
                post_process=cfg.test.post_process,
                shift_heatmap=cfg.test.shift_heatmap,
            )
            mean_conf = float(preds[:, :, 2].mean())
            storage.put_scalar("val_mean_conf", mean_conf)
            if mgr.save_best(int(state.step), mean_conf, state=gen_state):
                logger.info("new best at epoch %d (%.4f)", epoch, mean_conf)
        logger.info("epoch %d done", epoch)
    writer.close()


def _as_train_state(state, model):
    """Persist the generator side as a standard TrainState payload."""
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.train.state import TrainState

    st = TrainState.create(
        model,
        {"params": state.gen_params, "batch_stats": state.gen_stats},
        build_optimizer("adam", 1e-3),
    )
    return st.replace(step=state.step)


if __name__ == "__main__":
    main()
