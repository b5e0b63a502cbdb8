"""Training / evaluation pipeline + CLI — the `yolo/main.py` equivalent.

The reference spawns one process per GPU, NCCL-reduces losses, and
checkpoints on rank 0 (`yolo/main.py:21-162`). Here the pipeline is a
single SPMD program over the mesh: batches are sharded, the train step's
metrics are already global, and only host-side bookkeeping (logging,
checkpoints, schedulers, eval merge) remains.

Subcommands:
* ``train``      — epoch loop with mAP-or-val_loss model selection,
                   best/last checkpoints, multiscale, progress CSV + TB.
* ``evaluate``   — run COCO-protocol eval of a checkpoint, dump JSON
                   (the `detection/get_json_results.py` role).
* ``bench``      — defer to bench.py's pipeline.

Usage: python -m object_detectors_tpu.main train [group=name a.b=v ...]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from object_detectors_tpu.data import coco as data_coco
from object_detectors_tpu.data import idf as idf_lib
from object_detectors_tpu.data import synthetic
from object_detectors_tpu.eval import evaluator as eval_lib
from object_detectors_tpu.models import yolo_criterion as YC
from object_detectors_tpu.models.yolo import YoloHead
from object_detectors_tpu.parallel import mesh as mesh_lib
from object_detectors_tpu.train import checkpoint as ckpt_lib
from object_detectors_tpu.train import optim as optim_lib
from object_detectors_tpu.train import trainer
from object_detectors_tpu.utils import logging as log_lib
from object_detectors_tpu.utils.config import Config, load_config

log = logging.getLogger("object_detectors_tpu")


# --------------------------------------------------------------------- #
# Builders
# --------------------------------------------------------------------- #

def build_loss_config(cfg: Config) -> YC.YoloLossConfig:
    y = cfg.yolo
    return YC.YoloLossConfig(
        num_classes=int(y.classes),
        img_size=int(y.img_size),
        anchors=tuple(tuple(tuple(a) for a in scale)
                      for scale in cfg.dataset.anchors),
        ignore_threshold=float(y.ignore_threshold),
        iou_type=int(y.iou_type),
        lambda_iou=float(y.lambda_iou),
        lambda_xy=float(y.lambda_xy),
        lambda_wh=float(y.lambda_wh),
        lambda_conf=float(y.lambda_conf),
        lambda_no_conf=float(y.lambda_no_conf),
        lambda_cls=float(y.lambda_cls),
        alpha=float(y.alpha),
        gamma=float(y.gamma),
        class_loss=int(y.class_loss),
        reduction=str(y.reduction),
        tfidf_batch=bool(y.get("tfidf_batch", False)),
        tfidf_norm=int(y.get("tfidf_norm", 0)),
    )


def build_model(cfg: Config) -> YoloHead:
    dtype = jnp.bfloat16 if cfg.get_path("precision", "bf16") == "bf16" \
        else jnp.float32
    return YoloHead(
        num_classes=int(cfg.yolo.classes),
        anchors_per_scale=len(cfg.dataset.anchors[0]),
        backbone_layers=tuple(cfg.backbone.layers),
        use_spp=bool(cfg.neck.spp),
        use_fpn=bool(cfg.neck.fpn),
        pyramids=tuple(tuple(p) for p in cfg.neck.pyramids),
        dtype=dtype,
    )


def build_tfidf(cfg: Config, gt_train: dict | None):
    """yolo_forw.py:50-77 wiring: returns (class_weights, idf_logits,
    eq_rare_mask) as arrays or None/1.0."""
    y = cfg.yolo
    num_classes = int(y.classes)
    weights = None
    idf_logits = 1.0
    rare = None
    tfidf = list(y.tfidf)
    if (tfidf[0] or tfidf[1] or int(y.class_loss) == 2) and gt_train:
        tables = idf_lib.idf_tables(gt_train)
        variant = str(y.get("tfidf_variant", "smooth"))
        vec = np.asarray(tables[variant], np.float32)
        # pad/truncate to num_classes (classes with no annotations drop)
        full = np.ones(num_classes, np.float32)
        full[: min(len(vec), num_classes)] = vec[:num_classes]
        norm_p = int(y.get("tfidf_norm", 0))
        if tfidf[0] == 1:
            w = full.copy()
            if norm_p:
                w = w / np.linalg.norm(w, ord=norm_p)
            weights = jnp.asarray(w)
        elif tfidf[0] == 2:
            freq = np.ones(num_classes, np.float32)
            inst = np.asarray(tables["instance_freq"], np.float32)
            freq[: min(len(inst), num_classes)] = inst[:num_classes]
            from object_detectors_tpu.ops.losses import (
                effective_number_weights,
            )
            weights = effective_number_weights(jnp.asarray(freq))
        if tfidf[1] == 1:
            il = full.copy()
            if norm_p:
                il = il / np.linalg.norm(il, ord=norm_p)
            idf_logits = jnp.asarray(il)
        if int(y.class_loss) == 2:
            imgf = np.ones(num_classes, np.float32)
            f = np.asarray(tables["img_freq"], np.float32)
            imgf[: min(len(f), num_classes)] = f[:num_classes]
            rare = jnp.asarray(idf_lib.eq_rare_mask(imgf))
    return weights, idf_logits, rare


def build_dataset(cfg: Config, split: str):
    """Returns (dataset, gt_dict)."""
    d = cfg.dataset
    if d.dset_name == "synthetic":
        rng = np.random.RandomState(0 if split == "train" else 1)
        gt, loader = synthetic.renderable_dataset(
            rng, num_images=int(d.get("num_images", 16)),
            img_size=96, num_classes=int(d.num_classes))
        ds = data_coco.CocoDetectionDataset(
            gt, label_mode="lvis0", image_loader=loader)
        return ds, gt
    ann = d.train_annotations if split == "train" else d.val_annotations
    imgs_dir = d.get("train_images" if split == "train" else "val_images")
    label_mode = {"coco": "coco80", "lvis": "lvis0"}.get(
        d.dset_name, "raw")
    ds = data_coco.CocoDetectionDataset(ann, imgs_dir, label_mode,
                                        subset=float(
                                            d.tr_subset if split == "train"
                                            else d.ts_subset))
    return ds, ds.gt


def label_map_for(cfg: Config):
    name = cfg.dataset.dset_name
    if name == "coco":
        return lambda c: eval_lib.COCO_80_TO_91[c]
    return lambda c: c + 1  # lvis0/synthetic: contiguous -> 1-based ids


# --------------------------------------------------------------------- #
# Epoch procedures (procedures/{train,valid,test}_one_epoch.py parity)
# --------------------------------------------------------------------- #

def train_one_epoch(state, cfg, loss_cfg, dataset, mesh, epoch,
                    class_weights, idf_logits, writer=None, ckpt=None):
    num_classes = loss_cfg.num_classes
    anchors_per_scale = len(loss_cfg.anchors[0])
    logger = log_lib.MetricLogger()
    ms = cfg.multiscaler
    sizes = trainer.multiscale_sizes(
        loss_cfg.img_size, *tuple(ms.bounds)) if ms.multi_scale else \
        (loss_cfg.img_size,)
    cur_size = loss_cfg.img_size
    sub_sum = np.zeros(6)
    stat_sum = np.zeros(5)
    n_iters = 0

    # config-gated train augmentation (init_dataset.py:31: Augment is
    # prepended when dataset.augment > 0)
    augment_rng = None
    if int(cfg.dataset.get("augment", 0) or 0) > 0:
        augment_rng = np.random.RandomState(
            int(cfg.seed) * 977 + epoch + jax.process_index())
    # Device ingest (default ON, VERDICT r3 item 4): the host only
    # decodes (+ optional uint8 augments); bicubic resize + normalize
    # run INSIDE the jitted train step — image->gradients is one
    # program. Set dataset.device_ingest_train=false for the host path.
    ingest = bool(cfg.dataset.get("device_ingest_train", True))
    if ingest:
        batches = data_coco.yolo_batches_uint8(
            dataset, int(cfg.dataset.tr_batch_size), loss_cfg.img_size,
            canvas_size=int(cfg.dataset.get("canvas_size", 640)),
            max_boxes=int(cfg.dataset.get("max_boxes", 100)),
            shuffle=True, seed=int(cfg.seed) + epoch,
            augment_rng=augment_rng,
            process_index=jax.process_index(),
            process_count=jax.process_count())
    else:
        batches = data_coco.yolo_batches(
            dataset, int(cfg.dataset.tr_batch_size), loss_cfg.img_size,
            int(cfg.dataset.get("max_boxes", 100)), shuffle=True,
            seed=int(cfg.seed) + epoch,
            augment_rng=augment_rng,
            process_index=jax.process_index(),
            process_count=jax.process_count())

    for i, batch in enumerate(logger.log_every(
            batches, int(cfg.verbose_freq), f"epoch {epoch}",
            printer=log.info)):
        if ms.multi_scale and i % int(ms.freq) == 0:
            # all hosts derive the same size from (seed, epoch, i) — no
            # broadcast needed (train_one_epoch.py:24 equivalence)
            key = jax.random.fold_in(
                jax.random.key(int(cfg.seed)), epoch * 100003 + i)
            cur_size = trainer.pick_scale(key, sizes)
        scaled_cfg = loss_cfg if cur_size == loss_cfg.img_size else \
            YC.YoloLossConfig(**{
                **loss_cfg.__dict__, "img_size": int(cur_size)})
        if ingest:
            # multiscale costs nothing extra here: the device resize
            # targets cur_size straight from the same uint8 canvas
            sharded = mesh_lib.put_sharded(
                {"images": jnp.asarray(batch["images"]),
                 "sizes": jnp.asarray(batch["sizes"]),
                 "gt_boxes": jnp.asarray(batch["gt_boxes"]),
                 "gt_labels": jnp.asarray(batch["gt_labels"]),
                 "gt_valid": jnp.asarray(batch["gt_valid"])}, mesh)
            state, metrics = trainer.yolo_train_step_ingest(
                state, sharded["images"], sharded["sizes"],
                sharded["gt_boxes"], sharded["gt_labels"],
                sharded["gt_valid"], scaled_cfg, num_classes,
                anchors_per_scale=anchors_per_scale,
                class_weights=class_weights, idf_logits=idf_logits)
        else:
            images = jnp.asarray(batch["images"])
            if cur_size != images.shape[1]:
                images = jax.image.resize(
                    images, (images.shape[0], cur_size, cur_size, 3),
                    "linear")
            sharded = mesh_lib.put_sharded(
                {"images": images,
                 "gt_boxes": jnp.asarray(batch["gt_boxes"]),
                 "gt_labels": jnp.asarray(batch["gt_labels"]),
                 "gt_valid": jnp.asarray(batch["gt_valid"])}, mesh)
            state, metrics = trainer.yolo_train_step(
                state, sharded["images"], sharded["gt_boxes"],
                sharded["gt_labels"], sharded["gt_valid"], scaled_cfg,
                num_classes, anchors_per_scale,
                class_weights=class_weights, idf_logits=idf_logits)
        loss = float(metrics["loss"])
        if not np.isfinite(loss):
            log.warning("non-finite loss at epoch %d iter %d", epoch, i)
            return state, None, None  # reference aborts (ZeroDiv->None)
        sub_sum += np.asarray(metrics["sub_losses"])
        stat_sum += np.asarray(metrics["stats"])
        n_iters += 1
        try:  # real LR from the injected schedule hyperparameter
            cur_lr = float(state.opt_state.hyperparams["learning_rate"])
        except (AttributeError, KeyError, TypeError):
            cur_lr = float("nan")
        logger.update(loss=loss, lr=cur_lr)
        if writer is not None and bool(cfg.track_epoch):
            writer.scalar("iter/loss", loss,
                          epoch * 10_000 + i)
        # preemption-safe mid-epoch autosave (beyond the reference's
        # epoch-granular checkpoints; SURVEY.md §5.3 recommendation)
        autosave = int(cfg.get_path("autosave_steps", 0) or 0)
        if (ckpt is not None and autosave and n_iters % autosave == 0
                and jax.process_index() == 0):
            ckpt.save("autosave", state, epoch, {"metric": float("nan")})
    n = max(n_iters, 1)
    return state, sub_sum / n, stat_sum / n


def valid_one_epoch(state, cfg, loss_cfg, dataset, mesh):
    """Loss-only validation (valid_one_epoch.py:7-35)."""
    total, n = 0.0, 0
    for batch in data_coco.yolo_batches(
            dataset, int(cfg.dataset.ts_batch_size), loss_cfg.img_size,
            int(cfg.dataset.get("max_boxes", 100)),
            process_index=jax.process_index(),
            process_count=jax.process_count()):
        sharded = {k: jnp.asarray(batch[k]) for k in
                   ("images", "gt_boxes", "gt_labels", "gt_valid")}
        # criterion in eval mode (no grad): forward + yolo_loss
        model_outs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            sharded["images"], train=False)
        raw = YC.flatten_raw_outputs(
            model_outs, loss_cfg.num_classes,
            len(loss_cfg.anchors[0])).astype(jnp.float32)
        priors, gw = YC.make_priors(
            loss_cfg, tuple(o.shape[1] for o in model_outs))
        loss, _, _ = YC.yolo_loss(
            raw, priors, gw, sharded["gt_boxes"], sharded["gt_labels"],
            sharded["gt_valid"], loss_cfg)
        total += float(loss)
        n += 1
    return total / max(n, 1)


def test_one_epoch(state, cfg, loss_cfg, dataset, gt, mesh,
                   max_candidates=512, idf_logits=1.0):
    """Detection epoch + COCO eval (test_one_epoch.py + eval_results.py):
    decode -> conf threshold -> majority NMS -> rescale -> evaluator."""
    from object_detectors_tpu.ops import nms as nms_lib

    num_classes = loss_cfg.num_classes
    conf_thr = float(cfg.yolo.inf_confidence)
    iou_thr = float(cfg.yolo.inf_iou_threshold)
    device_pre = bool(cfg.dataset.get("device_preprocess", False))
    ev = eval_lib.DetectionEvaluator(gt, label_map_for(cfg))

    @jax.jit
    def decode_and_nms(images, sizes=None):
        if device_pre:
            # uint8 native-resolution canvas in, fused bicubic resize +
            # normalize on device (kernels/preprocess.py; north-star
            # replacement for the host cv2 path transformations.py:29)
            from object_detectors_tpu.kernels.preprocess import (
                resize_normalize_from_canvas,
            )

            images = resize_normalize_from_canvas(
                images, sizes, loss_cfg.img_size,
                jnp.float32).astype(jnp.float32)
        # idf logit scaling must match training (yolo_forw.py:170-173)
        dec = trainer.yolo_eval_step(
            state, images, loss_cfg, num_classes,
            len(loss_cfg.anchors[0]), idf_logits=idf_logits)
        score = dec[..., 4] * jnp.max(dec[..., 5:], -1)
        cls = jnp.argmax(dec[..., 5:], -1)
        k = min(max_candidates, dec.shape[1])
        from object_detectors_tpu.ops import selection as sel_lib

        topv, topi = jax.vmap(lambda s: sel_lib.radix_topk(s, k))(score)
        xy, wh = dec[..., :2], dec[..., 2:4]
        xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
        boxes = jnp.take_along_axis(xyxy, topi[..., None], 1)
        labels = jnp.take_along_axis(cls, topi, 1)
        valid = topv > conf_thr
        f = jax.vmap(lambda b, s, c, v: nms_lib.nms_majority(
            b, s, c, num_classes=num_classes, iou_threshold=iou_thr,
            max_output=100, valid=v))
        return f(boxes, topv, labels, valid)

    if device_pre:
        batches = data_coco.yolo_batches_uint8(
            dataset, int(cfg.dataset.ts_batch_size), loss_cfg.img_size,
            canvas_size=int(cfg.dataset.get("canvas_size", 640)),
            max_boxes=int(cfg.dataset.get("max_boxes", 100)),
            process_index=jax.process_index(),
            process_count=jax.process_count())
    else:
        batches = data_coco.yolo_batches(
            dataset, int(cfg.dataset.ts_batch_size), loss_cfg.img_size,
            int(cfg.dataset.get("max_boxes", 100)),
            process_index=jax.process_index(),
            process_count=jax.process_count())
    for batch in batches:
        bx, sc, lb, vd = decode_and_nms(
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["sizes"]) if device_pre else None)
        keep = batch["image_ids"] >= 0
        ev.update(batch["image_ids"][keep], np.asarray(bx)[keep],
                  np.asarray(sc)[keep], np.asarray(lb)[keep],
                  np.asarray(vd)[keep], batch["scale_factors"][keep])
    ev.synchronize_between_processes()
    stats = ev.summarize()
    return float(stats[0]), ev


# --------------------------------------------------------------------- #
# Pipelines
# --------------------------------------------------------------------- #

def train_pipeline(cfg: Config):
    out_dir = str(cfg.get_path("output_dir", "output/default"))
    os.makedirs(out_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        handlers=[logging.FileHandler(os.path.join(out_dir, "main.log")),
                  logging.StreamHandler(sys.stderr)])

    mesh_lib.maybe_initialize_distributed()
    mesh = mesh_lib.make_mesh_for_batch(
        int(cfg.dataset.tr_batch_size),
        model=int(cfg.get_path("mesh.model", 1)))
    loss_cfg = build_loss_config(cfg)
    model = build_model(cfg)
    train_ds, gt_train = build_dataset(cfg, "train")
    val_ds, gt_val = build_dataset(cfg, "val")
    # dataset-derived, so multistep/cyclic schedules scale correctly
    steps_per_epoch = max(
        len(train_ds) // int(cfg.dataset.tr_batch_size), 1)
    tx = optim_lib.make_optimizer(
        optim_lib.OptimizerConfig(
            name=str(cfg.optimizer.name),
            lr=float(cfg.optimizer.lr),
            weight_decay=float(cfg.optimizer.weight_decay),
            momentum=float(cfg.optimizer.get("momentum", 0.9))),
        optim_lib.SchedulerConfig(
            name=str(cfg.scheduler.name),
            step_size=int(cfg.scheduler.get("step_size", 100)),
            factor=float(cfg.scheduler.get("factor", 0.1)),
            milestones=tuple(cfg.scheduler.get("milestones", (15, 25))),
            base_lr=float(cfg.scheduler.get("base_lr", 1e-4)),
            max_lr=float(cfg.scheduler.get("max_lr", 1e-3)),
            mode=str(cfg.scheduler.get("mode", "max")),
            patience=int(cfg.scheduler.get("patience", 10))),
        steps_per_epoch)
    state = trainer.create_yolo_train_state(
        model, tx, loss_cfg.img_size, jax.random.key(int(cfg.seed)))
    state = mesh_lib.put_replicated(state, mesh)

    class_weights, idf_logits, _rare = build_tfidf(cfg, gt_train)

    ckpt = ckpt_lib.CheckpointManager(
        os.path.join(out_dir, str(cfg.experiment.cp)))
    start_epoch = 0
    metric_mode = "max" if cfg.metric == "mAP" else "min"
    best = -np.inf if metric_mode == "max" else np.inf
    if cfg.resume:
        restored = ckpt.restore("last", state)
        if restored:
            state, start_epoch, prev_metrics = restored
            start_epoch += 1
            log.info("resumed from epoch %d", start_epoch)

    plateau = optim_lib.PlateauState(
        factor=float(cfg.scheduler.get("factor", 0.1)),
        patience=int(cfg.scheduler.get("patience", 10)),
        mode=str(cfg.scheduler.get("mode", "max")))
    writer = log_lib.TensorBoardWriter(os.path.join(out_dir, "tb"))

    profile_steps = int(cfg.get_path("profile_steps", 0) or 0)
    for epoch in range(start_epoch, int(cfg.epochs)):
        t0 = time.time()
        if profile_steps and epoch == start_epoch:
            # jax.profiler trace of the first steps (SURVEY.md §5.1: the
            # reference only has wall-clock meters; we get real traces)
            jax.profiler.start_trace(os.path.join(out_dir, "profile"))
        state, sub, stats = train_one_epoch(
            state, cfg, loss_cfg, train_ds, mesh, epoch,
            class_weights, idf_logits, writer, ckpt)
        if profile_steps and epoch == start_epoch:
            jax.profiler.stop_trace()
        if sub is None:
            log.error("epoch %d aborted on non-finite loss", epoch)
            break
        if cfg.metric == "mAP":
            metric, _ = test_one_epoch(state, cfg, loss_cfg, val_ds,
                                       gt_val, mesh,
                                       idf_logits=idf_logits)
        else:
            metric = valid_one_epoch(state, cfg, loss_cfg, val_ds, mesh)
        if str(cfg.scheduler.name) == "reduce_on_plateau":
            scale = plateau.update(metric)
            state = state.replace(opt_state=_set_plateau_scale(
                state.opt_state, scale))
        best = ckpt.save_epoch(
            state, epoch, {"metric": metric}, metric, best, metric_mode)
        if jax.process_index() == 0:
            log_lib.write_progress_stats(
                os.path.join(out_dir, "progress", "progress.csv"),
                epoch, sub, stats, metric)
            names = ["xy", "wh", "iou", "pos_conf", "neg_conf", "cls"]
            for n_, v in zip(names, sub):
                writer.scalar(f"loss/{n_}", float(v), epoch)
            stat_names = ["avg_iou", "pos_conf", "no_obj_conf",
                          "pos_class", "neg_class"]
            for n_, v in zip(stat_names, stats):
                writer.scalar(f"stats/{n_}", float(v), epoch)
            writer.scalar(f"metric/{cfg.metric}", metric, epoch)
        log.info("epoch %d done in %.1fs %s=%.4f (best %.4f)",
                 epoch, time.time() - t0, cfg.metric, metric, best)
    writer.close()
    return state, best


def _set_plateau_scale(opt_state, scale):
    """Update the injected plateau_scale hyperparameter."""
    try:
        hp = opt_state.hyperparams
        hp["plateau_scale"] = jnp.asarray(scale, jnp.float32)
        return opt_state
    except AttributeError:
        return opt_state


def evaluate_pipeline(cfg: Config, checkpoint_tag: str = "best",
                      dump_json: str | None = None):
    mesh = mesh_lib.make_mesh(model=int(cfg.get_path("mesh.model", 1)))
    loss_cfg = build_loss_config(cfg)
    model = build_model(cfg)
    # must rebuild the SAME optimizer as training, else the restored
    # opt_state tree doesn't match (e.g. adam vs sgd)
    tx = optim_lib.make_optimizer(
        optim_lib.OptimizerConfig(
            name=str(cfg.optimizer.name), lr=float(cfg.optimizer.lr),
            weight_decay=float(cfg.optimizer.weight_decay),
            momentum=float(cfg.optimizer.get("momentum", 0.9))),
        optim_lib.SchedulerConfig(name=str(cfg.scheduler.name)), 1)
    state = trainer.create_yolo_train_state(
        model, tx, loss_cfg.img_size, jax.random.key(0))
    out_dir = str(cfg.get_path("output_dir", "output/default"))
    ckpt = ckpt_lib.CheckpointManager(
        os.path.join(out_dir, str(cfg.experiment.cp)))
    restored = ckpt.restore(checkpoint_tag, state)
    if restored:
        state = restored[0]
    val_ds, gt_val = build_dataset(cfg, "val")
    train_ds_e, gt_train_e = build_dataset(cfg, "train")
    _, idf_logits_e, _ = build_tfidf(cfg, gt_train_e)
    mAP, ev = test_one_epoch(state, cfg, loss_cfg, val_ds, gt_val, mesh,
                             idf_logits=idf_logits_e)
    if dump_json:
        ev.save_detections(dump_json)
    print(f"mAP: {mAP:.4f}")
    return mAP


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=["train", "evaluate"])
    ap.add_argument("overrides", nargs="*",
                    help="config overrides: group=name or a.b=value")
    ap.add_argument("--config-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs"))
    ap.add_argument("--checkpoint", default="best")
    ap.add_argument("--dump-json", default=None)
    args = ap.parse_args(argv)

    cfg = load_config(args.config_dir, args.overrides)
    if args.command == "train":
        train_pipeline(cfg)
    else:
        evaluate_pipeline(cfg, args.checkpoint, args.dump_json)


if __name__ == "__main__":
    main()
