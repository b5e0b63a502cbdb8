"""torchvision-style detection training/eval CLI — the
`torchvision_models/detection/train.py` equivalent.

Covers the reference CLI surface (train.py:208-270): dataset selection
(coco / lvis / synthetic), model factory (fasterrcnn / maskrcnn /
retinanet / ssd300), SGD + multistep LR with linear warmup
(detection/utils.py:239-247), tf-idf dict wiring (--tfidf column,
--tfidf-norm, --classif loss selector, --csl class weights,
train.py:103-135), resume, --test-only with detections JSON dump, and
the epoch loop train -> checkpoint -> evaluate (engine.py:13-109).

TPU shape: images are square-bucket resized host-side (min/max-size
rule of GeneralizedRCNNTransform applied inside a fixed canvas), GT
padded; one jitted SPMD train step per model covering both stages.
"""

from __future__ import annotations

import argparse
import logging
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from object_detectors_tpu.data import coco as data_coco
from object_detectors_tpu.data import idf as idf_lib
from object_detectors_tpu.data import transforms as T
from object_detectors_tpu.eval import evaluator as eval_lib
from object_detectors_tpu.models import anchors as anchor_lib
from object_detectors_tpu.models import faster_rcnn as FR
from object_detectors_tpu.models import mask_rcnn as MR
from object_detectors_tpu.models import retinanet as RN
from object_detectors_tpu.models import roi_heads as RH
from object_detectors_tpu.models import rpn as RPN
from object_detectors_tpu.models import ssd as SSD
from object_detectors_tpu.parallel import mesh as mesh_lib
from object_detectors_tpu.train import checkpoint as ckpt_lib
from object_detectors_tpu.train import optim as optim_lib
from object_detectors_tpu.utils import logging as log_lib

log = logging.getLogger("detection")


def rcnn_batches(dataset, batch_size, canvas: int, max_boxes=100,
                 shuffle=False, seed=0, min_size=800, max_size=1333,
                 process_index=0, process_count=1, hflip_rng=None,
                 with_masks=False):
    """Padded R-CNN batches: normalized images on a fixed square canvas,
    GT as absolute xyxy + 1-based labels (background = 0).

    with_masks: rasterize 'segmentation' annotations to canvas-resolution
    [B, M, canvas, canvas] float masks (Mask R-CNN training; memory
    scales with canvas^2 * max_boxes — use modest canvases)."""
    order = data_coco.shard_indices(len(dataset), process_index,
                                    process_count, shuffle, seed)

    def produce(i0):
        imgs, bxs, lbs, vds, ids, scales, msks = \
            [], [], [], [], [], [], []
        for idx in order[i0:i0 + batch_size]:
            image, tgt = dataset[int(idx)]
            boxes = tgt["boxes_xywh"].copy()
            if boxes.size:
                boxes[:, 2:] += boxes[:, :2]  # -> xyxy
            labels = tgt["labels"] + 1  # 1-based, 0 = background
            masks = None
            if with_masks:
                from object_detectors_tpu.data import masks as mask_lib

                img_id = tgt["image_id"]
                anns = dataset._anns_by_image.get(img_id, [])
                h0, w0 = image.shape[:2]
                if anns and "segmentation" in anns[0]:
                    masks = mask_lib.masks_for_annotations(anns, h0, w0)
                else:  # fall back to box-shaped masks
                    masks = np.zeros((len(boxes), h0, w0), np.float32)
                    for i_b, bb in enumerate(boxes):
                        x1, y1, x2, y2 = [int(round(v)) for v in bb]
                        masks[i_b, max(y1, 0):y2, max(x1, 0):x2] = 1.0
            flip = hflip_rng is not None and hflip_rng.rand() < 0.5
            if flip:
                image, boxes = T.hflip(image, boxes)
                if masks is not None:
                    masks = masks[:, :, ::-1].copy()
            padded, sboxes, true_size, scale = T.rcnn_resize(
                image, boxes, min_size=min_size, max_size=max_size,
                pad_to=(canvas, canvas))
            img = T.normalize_image(padded)
            b, l, v = T.pad_targets(sboxes, labels, max_boxes)
            if masks is not None:
                import cv2

                mpad = np.zeros((max_boxes, canvas, canvas), np.float32)
                nh, nw = true_size
                for i_m in range(min(len(masks), max_boxes)):
                    mpad[i_m, :nh, :nw] = cv2.resize(
                        masks[i_m], (nw, nh),
                        interpolation=cv2.INTER_NEAREST)
                msks.append(mpad)
            imgs.append(img)
            bxs.append(b)
            lbs.append(l)
            vds.append(v)
            ids.append(tgt["image_id"])
            scales.append((1.0 / scale, 1.0 / scale))
        while len(imgs) < batch_size:
            imgs.append(imgs[-1])
            bxs.append(bxs[-1])
            lbs.append(lbs[-1])
            vds.append(np.zeros_like(vds[-1]))
            ids.append(-1)
            scales.append(scales[-1])
            if msks:
                msks.append(np.zeros_like(msks[-1]))
        out = {
            "images": np.stack(imgs).astype(np.float32),
            "gt_boxes": np.stack(bxs),
            "gt_labels": np.stack(lbs).astype(np.int32),
            "gt_valid": np.stack(vds),
            "image_ids": np.array(ids, np.int64),
            "scale_factors": np.array(scales, np.float32),
        }
        if msks:
            out["gt_masks"] = np.stack(msks)
        return out

    yield from data_coco._prefetched(
        produce, range(0, len(order), batch_size), 2)


# ------------------------------------------------------------------ #
# Model adapters: build / loss / detections per architecture
# ------------------------------------------------------------------ #

class ModelAdapter:
    """Uniform (init, loss_fn, detect_fn) wrapper per architecture."""

    def __init__(self, name: str, num_classes: int, image_size: int,
                 loss_type: str = "ce", tfidf=1.0, resnet_layers=(3, 4, 6, 3),
                 small: bool = False, class_weights=None,
                 tfidf_mini_batch: bool = False, tfidf_norm: int = 0):
        self.name = name
        self.image_size = image_size
        self.tfidf = tfidf
        # the two-stage models take tfidf as a vector arg (None = off)
        self.tfidf_vec = tfidf if np.ndim(tfidf) > 0 else None
        self.class_weights = class_weights
        rpn_cfg = RPN.RPNConfig() if not small else RPN.RPNConfig(
            pre_nms_top_n_train=64, pre_nms_top_n_test=64,
            post_nms_top_n_train=32, post_nms_top_n_test=16,
            batch_size_per_image=32)
        roi_cfg = RH.RoIHeadsConfig(
            num_classes=num_classes, loss_type=loss_type,
            tfidf_mini_batch=tfidf_mini_batch, tfidf_norm=tfidf_norm,
            **({"batch_size_per_image": 16, "detections_per_img": 10}
               if small else {}))
        if name == "fasterrcnn_resnet50_fpn":
            self.model = FR.FasterRCNN(FR.FasterRCNNConfig(
                num_classes=num_classes, rpn=rpn_cfg, roi=roi_cfg,
                resnet_layers=tuple(resnet_layers)))
        elif name == "maskrcnn_resnet50_fpn":
            self.model = MR.MaskRCNN(MR.MaskRCNNConfig(
                num_classes=num_classes, rpn=rpn_cfg, roi=roi_cfg,
                resnet_layers=tuple(resnet_layers)))
        elif name == "retinanet_resnet50_fpn":
            self.cfg = RN.RetinaNetConfig(
                num_classes=num_classes,
                tfidf_mini_batch=tfidf_mini_batch, tfidf_norm=tfidf_norm)
            self.model = RN.RetinaNet(num_classes=num_classes,
                                      resnet_layers=tuple(resnet_layers))
        elif name == "ssd300_vgg16":
            self.cfg = SSD.SSDConfig(
                num_classes=num_classes,
                tfidf_mini_batch=tfidf_mini_batch, tfidf_norm=tfidf_norm)
            self.model = SSD.SSD300(self.cfg)
        else:
            raise ValueError(name)

    # ---------------- init ----------------
    def init_variables(self, rng):
        x = jnp.zeros((1, self.image_size, self.image_size, 3))
        if self.name in ("fasterrcnn_resnet50_fpn",
                         "maskrcnn_resnet50_fpn"):
            gt = jnp.asarray([[[1.0, 1.0, 10.0, 10.0]]])
            gl = jnp.ones((1, 1), jnp.int32)
            gv = jnp.ones((1, 1), bool)
            args = (x, gt, gl, gv)
            if self.name == "maskrcnn_resnet50_fpn":
                gm = jnp.zeros((1, 1, self.image_size, self.image_size))
                args = (x, gt, gl, gv, gm)
            return self.model.init(
                {"params": rng, "sampler": jax.random.fold_in(rng, 1)},
                *args, train=True)
        return self.model.init(rng, x, train=False)

    def _anchors_for(self):
        s = self.image_size
        if self.name == "retinanet_resnet50_fpn":
            grids = [(s // 8, s // 8), (s // 16, s // 16),
                     (s // 32, s // 32), (s // 64, s // 64),
                     (s // 128, s // 128)]
            sizes, ars = anchor_lib.retinanet_anchor_config()
            return jnp.asarray(anchor_lib.grid_anchors(
                (s, s), grids, sizes, ars))
        if self.name == "ssd300_vgg16":
            return None  # depends on head level sizes; computed lazily
        return None

    # ---------------- loss ----------------
    def losses(self, variables, batch, rng, train=True):
        imgs = batch["images"]
        if self.name in ("fasterrcnn_resnet50_fpn",
                         "maskrcnn_resnet50_fpn"):
            args = (imgs, batch["gt_boxes"], batch["gt_labels"],
                    batch["gt_valid"])
            if self.name == "maskrcnn_resnet50_fpn":
                b, m = batch["gt_labels"].shape
                gm = batch.get("gt_masks")
                if gm is None:
                    gm = jnp.zeros((b, m) + imgs.shape[1:3])
                args = args + (gm,)
            return self.model.apply(variables, *args, train=True,
                                    tfidf=self.tfidf_vec,
                                    class_weights=self.class_weights,
                                    rngs={"sampler": rng})
        if self.name == "retinanet_resnet50_fpn":
            cls, reg, level_sizes = self.model.apply(
                variables, imgs, train=True,
                mutable=False)
            anchors = self._anchors_for()
            # retinanet labels in our GT are 1-based w/ background 0;
            # reference keeps raw dataset labels — shift back to 0-based
            return RN.retinanet_loss(
                cls.astype(jnp.float32), reg.astype(jnp.float32),
                anchors, batch["gt_boxes"],
                jnp.clip(batch["gt_labels"] - 1, 0), batch["gt_valid"],
                self.cfg, tfidf=self.tfidf)
        # ssd
        cls, reg, level_sizes = self.model.apply(variables, imgs,
                                                 train=True)
        anchors = self._ssd_anchors(level_sizes)
        return SSD.ssd_loss(
            cls.astype(jnp.float32), reg.astype(jnp.float32), anchors,
            batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
            self.cfg, tfidf=self.tfidf)

    def _ssd_anchors(self, level_sizes):
        a_per = (4, 6, 6, 6, 4, 4)
        grids = [(int(np.sqrt(ls / a)),) * 2
                 for ls, a in zip(level_sizes, a_per)]
        return jnp.asarray(anchor_lib.ssd_default_boxes(
            (self.image_size, self.image_size), grids))

    # ---------------- detections ----------------
    def detect(self, variables, images):
        s = self.image_size
        if self.name in ("fasterrcnn_resnet50_fpn",):
            return self.model.apply(variables, images, train=False,
                                    tfidf=self.tfidf_vec)
        if self.name == "maskrcnn_resnet50_fpn":
            out = self.model.apply(variables, images, train=False,
                                   tfidf=self.tfidf_vec)
            return out[:4]  # boxes, scores, labels, valid (masks extra)
        if self.name == "retinanet_resnet50_fpn":
            cls, reg, level_sizes = self.model.apply(
                variables, images, train=False)
            anchors = self._anchors_for()
            b, sc, lab, v = RN.retinanet_postprocess(
                cls.astype(jnp.float32), reg.astype(jnp.float32),
                anchors, tuple(level_sizes), (s, s), self.cfg,
                tfidf_post=self.tfidf)
            return b, sc, lab + 1, v  # back to 1-based for the evaluator
        cls, reg, level_sizes = self.model.apply(variables, images,
                                                 train=False)
        anchors = self._ssd_anchors(level_sizes)
        return SSD.ssd_postprocess(
            cls.astype(jnp.float32), reg.astype(jnp.float32), anchors,
            (s, s), self.cfg, tfidf_post=self.tfidf)


def build_tfidf_vector(args, gt_train, num_classes):
    """train.py:103-135: read idf table column, optional normalization;
    returns a [num_classes] logit-scale vector or 1.0."""
    if not args.tfidf:
        return 1.0
    tables = idf_lib.idf_tables(gt_train)
    col = tables.get(args.tfidf)
    if col is None:
        raise SystemExit(f"unknown tfidf column {args.tfidf}")
    vec = np.ones(num_classes, np.float32)
    kept = tables["_kept_category_ids"]
    for i, cid in enumerate(kept):
        if cid < num_classes:
            vec[cid] = col[i]
    if args.tfidf_norm:
        vec = vec / np.linalg.norm(vec, ord=args.tfidf_norm)
    return jnp.asarray(vec)


def build_csl_weights(args, gt_train, num_classes):
    """train.py:121-135: CSL classification weights. 'eff_samp' builds
    effective-number weights (1-b)/(1-b^n) from instance_freq with
    weight 1 at background; any other value picks an idf table column;
    None disables."""
    if not args.csl:
        return None
    tables = idf_lib.idf_tables(gt_train)
    kept = tables["_kept_category_ids"]
    if args.csl == "eff_samp":
        freq = np.zeros(num_classes, np.float64)
        for i, cid in enumerate(kept):
            if cid < num_classes:
                freq[cid] = tables["instance_freq"][i]
        beta = 0.9999
        eff = 1.0 - np.power(beta, freq)
        w = np.where(eff > 0, (1.0 - beta) / np.maximum(eff, 1e-12), 1.0)
        w[0] = 1.0  # background stays unweighted (train.py:128)
        return jnp.asarray(w, jnp.float32)
    col = tables.get(args.csl)
    if col is None:
        raise SystemExit(f"unknown csl column {args.csl}")
    vec = np.ones(num_classes, np.float32)
    for i, cid in enumerate(kept):
        if cid < num_classes:
            vec[cid] = col[i]
    return jnp.asarray(vec)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic",
                    choices=["coco", "lvis", "synthetic"])
    ap.add_argument("--data-path", default="datasets/coco")
    ap.add_argument("--model", default="retinanet_resnet50_fpn",
                    choices=["fasterrcnn_resnet50_fpn",
                             "maskrcnn_resnet50_fpn",
                             "retinanet_resnet50_fpn", "ssd300_vgg16"])
    ap.add_argument("--epochs", type=int, default=26)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=0.02 / 8)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--weight-decay", type=float, default=1e-4)
    ap.add_argument("--lr-steps", type=int, nargs="+", default=[16, 22])
    ap.add_argument("--lr-gamma", type=float, default=0.1)
    ap.add_argument("--image-size", type=int, default=800)
    ap.add_argument("--max-boxes", type=int, default=100)
    ap.add_argument("--tfidf", default=None,
                    help="idf column name, e.g. smooth / raw / gombit")
    ap.add_argument("--tfidf-norm", type=int, default=0)
    ap.add_argument("--tfidf_mini_batch", "--tfidf-mini-batch",
                    action="store_true", dest="tfidf_mini_batch",
                    help="recompute tfidf per minibatch (train.py:246)")
    ap.add_argument("--csl", default=None,
                    help="cost-sensitive class weights: 'eff_samp' or an "
                         "idf column (train.py:121-135)")
    ap.add_argument("--classif", default="ce",
                    choices=["ce", "bce", "focal_loss", "gombit",
                             "gombit_fl"])
    ap.add_argument("--resume", default=None)
    ap.add_argument("--test-only", action="store_true")
    ap.add_argument("--output-dir", default="output/detection")
    ap.add_argument("--dump-json", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--small", action="store_true",
                    help="tiny model/backbone for smoke runs")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.output_dir, exist_ok=True)

    # ---- dataset ----
    if args.dataset == "synthetic":
        from object_detectors_tpu.data import synthetic

        rng = np.random.RandomState(0)
        gt_train = synthetic.make_coco_dicts(rng, 16, 96, 4)
        gt_val = synthetic.make_coco_dicts(
            np.random.RandomState(1), 8, 96, 4)
        imgs = {}
        for g in (gt_train, gt_val):
            for im in g["images"]:
                imgs[(id(g), im["id"])] = np.random.RandomState(
                    im["id"]).randint(0, 255, (96, 96, 3)).astype(np.uint8)
        train_ds = data_coco.CocoDetectionDataset(
            gt_train, label_mode="lvis0",
            image_loader=lambda i, g=gt_train: imgs[(id(g), i["id"])])
        val_ds = data_coco.CocoDetectionDataset(
            gt_val, label_mode="lvis0",
            image_loader=lambda i, g=gt_val: imgs[(id(g), i["id"])])
        num_classes = 5  # 4 + background
        min_size, max_size = args.image_size, args.image_size * 2
    else:
        root = args.data_path
        split = ("instances_train2017.json", "instances_val2017.json") \
            if args.dataset == "coco" else (
                "lvis_v1_train.json", "lvis_v1_val.json")
        train_ds = data_coco.CocoDetectionDataset(
            os.path.join(root, "annotations", split[0]),
            os.path.join(root, "train2017"), label_mode="raw")
        val_ds = data_coco.CocoDetectionDataset(
            os.path.join(root, "annotations", split[1]),
            os.path.join(root, "val2017"), label_mode="raw")
        num_classes = 91 if args.dataset == "coco" else 1204
        min_size, max_size = 800, 1333
        train_ds.label_mode = "raw"
        # raw category ids ARE the 1-based labels for torchvision models
    gt_train, gt_val = train_ds.gt, val_ds.gt

    tfidf_vec = build_tfidf_vector(args, gt_train, num_classes)
    csl_weights = build_csl_weights(args, gt_train, num_classes)
    adapter = ModelAdapter(
        args.model, num_classes, args.image_size,
        loss_type=args.classif, tfidf=tfidf_vec,
        resnet_layers=(1, 1, 1, 1) if args.small else (3, 4, 6, 3),
        small=args.small, class_weights=csl_weights,
        tfidf_mini_batch=args.tfidf_mini_batch,
        tfidf_norm=args.tfidf_norm)

    mesh = mesh_lib.make_mesh_for_batch(args.batch_size)
    variables = adapter.init_variables(jax.random.key(args.seed))
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    tx = optim_lib.make_optimizer(
        optim_lib.OptimizerConfig("sgd", args.lr, args.weight_decay,
                                  args.momentum),
        optim_lib.SchedulerConfig(
            "multistep", milestones=tuple(args.lr_steps),
            factor=args.lr_gamma, warmup_steps=min(1000, steps_per_epoch),
            warmup_factor=1.0 / 1000),
        steps_per_epoch)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)

    ckpt = ckpt_lib.CheckpointManager(
        os.path.join(args.output_dir, "checkpoints"))

    train_state = {"params": params, "opt_state": opt_state,
                   "step": jnp.zeros((), jnp.int32)}
    start_epoch = 0
    if args.resume:
        restored = _restore(ckpt, args.resume, train_state)
        if restored:
            train_state, start_epoch = restored

    @jax.jit
    def train_step(ts, batch, rng):
        def loss_fn(p):
            losses = adapter.losses({**rest, "params": p}, batch, rng)
            return sum(jnp.asarray(v) for v in losses.values()), losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts["params"])
        updates, new_opt = tx.update(grads, ts["opt_state"], ts["params"])
        new_params = optax.apply_updates(ts["params"], updates)
        return ({"params": new_params, "opt_state": new_opt,
                 "step": ts["step"] + 1}, total, losses)

    @jax.jit
    def eval_step(params, images):
        return adapter.detect({**rest, "params": params}, images)

    def evaluate(params):
        ev = eval_lib.DetectionEvaluator(gt_val, label_map=lambda c: c)
        for batch in rcnn_batches(
                val_ds, args.batch_size, args.image_size, args.max_boxes,
                min_size=min_size, max_size=max_size):
            b, sc, lab, v = eval_step(params,
                                      jnp.asarray(batch["images"]))
            keep = batch["image_ids"] >= 0
            ev.update(batch["image_ids"][keep], np.asarray(b)[keep],
                      np.asarray(sc)[keep], np.asarray(lab)[keep],
                      np.asarray(v)[keep], batch["scale_factors"][keep])
        ev.synchronize_between_processes()
        stats = ev.summarize()
        return float(stats[0]), ev

    if args.test_only:
        mAP, ev = evaluate(train_state["params"])
        if args.dump_json:
            ev.save_detections(args.dump_json)
        print(f"mAP: {mAP:.4f}")
        return mAP

    hflip_rng = np.random.RandomState(args.seed + 7)
    with_masks = args.model == "maskrcnn_resnet50_fpn"
    logger = log_lib.MetricLogger()
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        for i, batch in enumerate(rcnn_batches(
                train_ds, args.batch_size, args.image_size,
                args.max_boxes, shuffle=True, seed=args.seed + epoch,
                min_size=min_size, max_size=max_size,
                hflip_rng=hflip_rng, with_masks=with_masks)):
            jb = mesh_lib.put_sharded(
                {k: jnp.asarray(v) for k, v in batch.items()
                 if k not in ("image_ids", "scale_factors")}, mesh)
            rng = jax.random.fold_in(
                jax.random.key(args.seed), epoch * 100003 + i)
            train_state, total, losses = train_step(train_state, jb, rng)
            total = float(total)
            if not np.isfinite(total):
                log.error("Loss is %s, stopping (engine.py:40-43)", total)
                return None
            logger.update(loss=total,
                          **{k: float(v) for k, v in losses.items()})
        mAP, _ = evaluate(train_state["params"])
        _save(ckpt, f"model_{epoch}", train_state, epoch, mAP)
        _save(ckpt, "last", train_state, epoch, mAP)
        log.info("epoch %d: %s mAP=%.4f (%.1fs)", epoch, logger, mAP,
                 time.time() - t0)
    return train_state


def _save(ckpt, tag, train_state, epoch, metric):
    if jax.process_index() != 0:
        return
    ckpt.save_raw(tag, train_state, epoch, {"mAP": metric})


def _restore(ckpt, tag, template):
    out = ckpt.restore_raw(tag, template)
    if out is None:
        return None
    restored, epoch, _metrics = out
    return restored, epoch + 1


if __name__ == "__main__":
    main()
