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
from object_detectors_tpu.models import keypoint_rcnn as KR
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
                 with_masks=False, with_keypoints=False,
                 augmentation="hflip", ar_group_factor=-1,
                 device_ingest=False, native_canvas=None):
    """Padded R-CNN batches: normalized images on a fixed square canvas,
    GT as absolute xyxy + 1-based labels (background = 0).

    with_masks: rasterize 'segmentation' annotations to canvas-resolution
    [B, M, canvas, canvas] float masks (Mask R-CNN training; memory
    scales with canvas^2 * max_boxes — use modest canvases).
    augmentation: preset policy applied when hflip_rng is given
    (presets.py:5-38): 'hflip', 'ssd' (photometric + zoom-out + IoU crop
    + hflip), 'ssdlite' (IoU crop + hflip). The crop/zoom presets skip
    mask batches (the reference never pairs them either).
    ar_group_factor >= 0 enables aspect-ratio grouped batching
    (train.py:83-85 / group_by_aspect_ratio.py).
    device_ingest (train AND eval): the host keeps JPEG decode + uint8
    augmentations — images are yielded as a uint8 native-resolution
    canvas [B, nc, nc, 3] plus true ``sizes`` and per-image
    ``min_sizes`` (the train path's random min-size draws); the
    min/max-size bilinear resize + normalize + pad run on device
    (kernels/preprocess.rcnn_resize_normalize_from_canvas,
    BASELINE.json north-star item). GT boxes/masks/keypoints/scales
    are still computed on the host with the identical scale formula
    (masks rasterize at the device-resized dims). ``native_canvas``
    defaults to the dataset's max image side (images larger are
    host-downscaled to fit — rare)."""
    if device_ingest and native_canvas is None:
        # size metadata is in the COCO image records — no decode needed
        infos = [dataset._images[i] for i in dataset.ids]
        native_canvas = max(max(d["height"], d["width"]) for d in infos)
    order = data_coco.shard_indices(len(dataset), process_index,
                                    process_count, shuffle, seed)
    if ar_group_factor is not None and ar_group_factor >= 0:
        from object_detectors_tpu.data import grouping

        ars = grouping.dataset_aspect_ratios(dataset)[order]
        gids = grouping.group_ids(
            ars, grouping.aspect_ratio_bins(ar_group_factor))
        batch_lists = [
            [int(order[i]) for i in bl]
            for bl in grouping.grouped_batch_indices(
                gids, batch_size, shuffle=False)]
    else:
        batch_lists = [order[i0:i0 + batch_size].tolist()
                       for i0 in range(0, len(order), batch_size)]

    # device_ingest supports the TRAIN path too (VERDICT r3 item 4 /
    # missing #2): augmentations run on the native uint8 image BEFORE
    # canvas placement, GT/masks/keypoints are scaled on the host with
    # the same formula the device resize replays. Float-producing
    # augments (photometric/zoom-out fill) quantize back to uint8 at
    # canvas write — the host path keeps them f32; documented delta.

    def produce(idx_list):
        imgs, bxs, lbs, vds, ids, scales, msks, kplist, szs = \
            [], [], [], [], [], [], [], [], []
        mslist = []
        for idx in idx_list:
            image, tgt = dataset[int(idx)]
            boxes = tgt["boxes_xywh"].copy()
            if boxes.size:
                boxes[:, 2:] += boxes[:, :2]  # -> xyxy
            labels = tgt["labels"] + 1  # 1-based, 0 = background
            kps = tgt.get("keypoints") if with_keypoints else None
            if with_keypoints and kps is None:
                kps = np.zeros((len(boxes), 17, 3), np.float32)
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
            if (hflip_rng is not None and masks is None and kps is None
                    and augmentation in ("ssd", "ssdlite")):
                if augmentation == "ssd":
                    image = T.photometric_distort(hflip_rng, image)
                    if hflip_rng.rand() < 0.5:
                        image, boxes = T.random_zoom_out(
                            hflip_rng, image, boxes)
                image, boxes, labels = T.random_iou_crop(
                    hflip_rng, image, boxes, labels)
            flip = hflip_rng is not None and hflip_rng.rand() < 0.5
            if flip:
                w0_flip = image.shape[1]
                image, boxes = T.hflip(image, boxes)
                if masks is not None:
                    masks = masks[:, :, ::-1].copy()
                if kps is not None and len(kps):
                    kps = T.hflip_keypoints(
                        np.asarray(kps, np.float32), w0_flip)
            # GeneralizedRCNNTransform trains with a random min-size
            # choice when a tuple is configured (transform.py:150-173);
            # eval uses the last entry
            ms = min_size
            if isinstance(min_size, (tuple, list)):
                ms = (min_size[hflip_rng.randint(len(min_size))]
                      if hflip_rng is not None else min_size[-1])
            if device_ingest:
                # host keeps only decode: native uint8 on a fixed
                # canvas; scale computed with the formula the device
                # kernel replays so GT/scale_factors agree exactly
                h0, w0 = image.shape[:2]
                hr_x = hr_y = 1.0  # host pre-downscale factors
                if h0 > native_canvas or w0 > native_canvas:
                    from PIL import Image

                    r = min(native_canvas / h0, native_canvas / w0)
                    nh0, nw0 = max(int(h0 * r), 1), max(int(w0 * r), 1)
                    image = np.asarray(Image.fromarray(
                        image.astype(np.uint8)).resize(
                            (nw0, nh0), Image.BILINEAR))
                    # per-axis: int() truncation makes nh0/h0 != nw0/w0
                    hr_y, hr_x = nh0 / h0, nw0 / w0
                    if boxes.size:
                        boxes = boxes * np.array(
                            [hr_x, hr_y, hr_x, hr_y], np.float32)
                    if kps is not None and len(kps):
                        kps = np.asarray(kps, np.float32).copy()
                        kps[..., 0] *= hr_x
                        kps[..., 1] *= hr_y
                    h0, w0 = nh0, nw0
                scale = min(
                    T.min_max_resize_factor(h0, w0, ms, max_size),
                    canvas / h0, canvas / w0)
                img = np.zeros((native_canvas, native_canvas, 3),
                               np.uint8)
                img[:h0, :w0] = image.astype(np.uint8)
                sboxes = (boxes.astype(np.float32) * scale if boxes.size
                          else np.zeros((0, 4), np.float32))
                true_size = (h0, w0)
                # masks/keypoints live in device-RESIZED coords — the
                # device kernel computes round(native * scale); replay
                # it (np.round == jnp.round, both half-to-even)
                content_size = (int(np.round(h0 * scale)),
                                int(np.round(w0 * scale)))
                szs.append((h0, w0))
                mslist.append(float(ms))
                # detections live in (host downscale x device resize)
                # coords; invert BOTH to map back to original pixels
                inv_sx, inv_sy = 1.0 / (scale * hr_x), 1.0 / (scale * hr_y)
            else:
                padded, sboxes, true_size, scale = T.rcnn_resize(
                    image, boxes, min_size=ms, max_size=max_size,
                    pad_to=(canvas, canvas))
                # normalize BEFORE padding like the reference
                # (transform.py normalizes :129-138 then batch_images
                # zero-pads :208-226) — the pad region must be 0 in
                # normalized space, not normalize(0) = -mean/std
                img = T.normalize_image(padded)
                img[true_size[0]:] = 0.0
                img[:, true_size[1]:] = 0.0
                content_size = true_size
                inv_sx = inv_sy = 1.0 / scale
            b, l, v = T.pad_targets(sboxes, labels, max_boxes)
            if kps is not None:
                kp = np.asarray(kps, np.float32).copy()
                kpad = np.zeros((max_boxes, kp.shape[1] if kp.size else 17,
                                 3), np.float32)
                if kp.size:
                    kp[..., :2] *= scale  # follow the image resize
                    n_k = min(len(kp), max_boxes)
                    kpad[:n_k] = kp[:n_k]
                kplist.append(kpad)
            if masks is not None:
                import cv2

                mpad = np.zeros((max_boxes, canvas, canvas), np.float32)
                nh, nw = content_size
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
            scales.append((inv_sx, inv_sy))
        while len(imgs) < batch_size:
            imgs.append(imgs[-1])
            bxs.append(bxs[-1])
            lbs.append(lbs[-1])
            vds.append(np.zeros_like(vds[-1]))
            ids.append(-1)
            scales.append(scales[-1])
            if msks:
                msks.append(np.zeros_like(msks[-1]))
            if kplist:
                kplist.append(np.zeros_like(kplist[-1]))
            if szs:
                szs.append(szs[-1])
            if mslist:
                mslist.append(mslist[-1])
        out = {
            "images": (np.stack(imgs) if device_ingest
                       else np.stack(imgs).astype(np.float32)),
            "gt_boxes": np.stack(bxs),
            "gt_labels": np.stack(lbs).astype(np.int32),
            "gt_valid": np.stack(vds),
            "image_ids": np.array(ids, np.int64),
            "scale_factors": np.array(scales, np.float32),
        }
        if device_ingest:
            out["sizes"] = np.array(szs, np.int32)
            out["min_sizes"] = np.array(mslist, np.float32)
        if msks:
            out["gt_masks"] = np.stack(msks)
        if kplist:
            out["gt_keypoints"] = np.stack(kplist)
        return out

    yield from data_coco._prefetched(produce, batch_lists, 2)


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
        elif name == "keypointrcnn_resnet50_fpn":
            self.model = KR.KeypointRCNN(KR.KeypointRCNNConfig(
                num_classes=num_classes, rpn=rpn_cfg, roi=roi_cfg,
                resnet_layers=tuple(resnet_layers),
                kp_head_layers=2 if small else 8,
                kp_head_features=64 if small else 512))
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
                         "maskrcnn_resnet50_fpn",
                         "keypointrcnn_resnet50_fpn"):
            gt = jnp.asarray([[[1.0, 1.0, 10.0, 10.0]]])
            gl = jnp.ones((1, 1), jnp.int32)
            gv = jnp.ones((1, 1), bool)
            args = (x, gt, gl, gv)
            if self.name == "maskrcnn_resnet50_fpn":
                gm = jnp.zeros((1, 1, self.image_size, self.image_size))
                args = (x, gt, gl, gv, gm)
            elif self.name == "keypointrcnn_resnet50_fpn":
                gkp = jnp.zeros((1, 1, 17, 3))
                args = (x, gt, gl, gv, gkp)
            return self.model.init(
                {"params": rng, "sampler": jax.random.fold_in(rng, 1)},
                *args, train=True)
        return self.model.init(rng, x, train=False)

    def _anchors_for(self):
        s = self.image_size
        if self.name == "retinanet_resnet50_fpn":
            # ceil-chain grids, NOT s // stride (anchors.fpn_grid_sizes
            # docstring: floor grids under-count P6/P7 at e.g. 320)
            grids = anchor_lib.fpn_grid_sizes((s, s))
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
                         "maskrcnn_resnet50_fpn",
                         "keypointrcnn_resnet50_fpn"):
            args = (imgs, batch["gt_boxes"], batch["gt_labels"],
                    batch["gt_valid"])
            b, m = batch["gt_labels"].shape
            if self.name == "maskrcnn_resnet50_fpn":
                gm = batch.get("gt_masks")
                if gm is None:
                    gm = jnp.zeros((b, m) + imgs.shape[1:3])
                args = args + (gm,)
            elif self.name == "keypointrcnn_resnet50_fpn":
                gkp = batch.get("gt_keypoints")
                if gkp is None:
                    gkp = jnp.zeros((b, m, 17, 3))
                args = args + (gkp,)
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
        if self.name in ("maskrcnn_resnet50_fpn",
                         "keypointrcnn_resnet50_fpn"):
            out = self.model.apply(variables, images, train=False,
                                   tfidf=self.tfidf_vec)
            return out[:4]  # boxes, scores, labels, valid (+extras)
        if self.name == "retinanet_resnet50_fpn":
            cls, reg, level_sizes = self.model.apply(
                variables, images, train=False)
            anchors = self._anchors_for()
            # native-dtype logits: selection is exact on bf16, only
            # survivors are cast (retinanet_postprocess docstring)
            grids = tuple(anchor_lib.fpn_grid_sizes((s, s)))
            b, sc, lab, v = RN.retinanet_postprocess(
                cls, reg, anchors, tuple(level_sizes), (s, s), self.cfg,
                tfidf_post=self.tfidf, grids=grids)
            return b, sc, lab + 1, v  # back to 1-based for the evaluator
        cls, reg, level_sizes = self.model.apply(variables, images,
                                                 train=False)
        anchors = self._ssd_anchors(level_sizes)
        return SSD.ssd_postprocess(
            cls.astype(jnp.float32), reg.astype(jnp.float32), anchors,
            (s, s), self.cfg, tfidf_post=self.tfidf)

    def detect_with_masks(self, variables, images):
        """Mask R-CNN only: (boxes, scores, labels, valid, masks) with
        masks [B, D, 28, 28] per-detection probability maps."""
        assert self.name == "maskrcnn_resnet50_fpn"
        return self.model.apply(variables, images, train=False,
                                tfidf=self.tfidf_vec)

    def detect_with_keypoints(self, variables, images):
        """Keypoint R-CNN only: (boxes, scores, labels, valid,
        keypoints [B, D, K, 3], kp_scores [B, D, K])."""
        assert self.name == "keypointrcnn_resnet50_fpn"
        return self.model.apply(variables, images, train=False,
                                tfidf=self.tfidf_vec)


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
                    choices=["coco", "coco_kp", "lvis", "synthetic"])
    ap.add_argument("--data-path", default="datasets/coco")
    ap.add_argument("--model", default="retinanet_resnet50_fpn",
                    choices=["fasterrcnn_resnet50_fpn",
                             "maskrcnn_resnet50_fpn",
                             "keypointrcnn_resnet50_fpn",
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
    ap.add_argument("--data-augmentation", default="hflip",
                    choices=["hflip", "ssd", "ssdlite"],
                    help="train augmentation preset (presets.py:5-38)")
    ap.add_argument("--aspect-ratio-group-factor", type=int, default=3,
                    help="AR-grouped batching bins (train.py:83-85); "
                         "-1 disables")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--test-only", action="store_true")
    ap.add_argument("--output-dir", default="output/detection")
    ap.add_argument("--dump-json", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--small", action="store_true",
                    help="tiny model/backbone for smoke runs")
    ap.add_argument("--device-ingest", action="store_true",
                    help="eval ingest on device: host decodes to a "
                         "uint8 native canvas; resize+normalize+pad "
                         "run inside the jitted eval program "
                         "(kernels/preprocess)")
    ap.add_argument("--renderable", action="store_true",
                    help="synthetic images with drawn class-colored "
                         "boxes (learnable signal) instead of noise — "
                         "used to train the checked-in weight artifacts")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.output_dir, exist_ok=True)

    # ---- dataset ----
    if args.dataset == "synthetic":
        from object_detectors_tpu.data import synthetic

        rng = np.random.RandomState(0)
        with_segm = args.model == "maskrcnn_resnet50_fpn"
        with_kp = args.model == "keypointrcnn_resnet50_fpn"
        n_cls = 1 if with_kp else 4  # coco_kp is person-only
        gt_train = synthetic.make_coco_dicts(
            rng, 16, 96, n_cls, with_segmentation=with_segm,
            with_keypoints=with_kp)
        gt_val = synthetic.make_coco_dicts(
            np.random.RandomState(1), 8, 96, n_cls,
            with_segmentation=with_segm, with_keypoints=with_kp)
        imgs = {}
        for g in (gt_train, gt_val):
            for im in g["images"]:
                if args.renderable:
                    imgs[(id(g), im["id"])] = synthetic.render_image(
                        g, im["id"])
                else:
                    imgs[(id(g), im["id"])] = np.random.RandomState(
                        im["id"]).randint(0, 255,
                                          (96, 96, 3)).astype(np.uint8)
        train_ds = data_coco.CocoDetectionDataset(
            gt_train, label_mode="lvis0",
            image_loader=lambda i, g=gt_train: imgs[(id(g), i["id"])])
        val_ds = data_coco.CocoDetectionDataset(
            gt_val, label_mode="lvis0",
            image_loader=lambda i, g=gt_val: imgs[(id(g), i["id"])])
        num_classes = n_cls + 1  # + background
        min_size, max_size = args.image_size, args.image_size * 2
    else:
        root = args.data_path
        # dataset registry (train.py:47-51: coco 91 / coco_kp 2 / lvis)
        split = {
            "coco": ("instances_train2017.json",
                     "instances_val2017.json"),
            "coco_kp": ("person_keypoints_train2017.json",
                        "person_keypoints_val2017.json"),
            "lvis": ("lvis_v1_train.json", "lvis_v1_val.json"),
        }[args.dataset]
        # lvis0 maps category ids to 0-based; rcnn_batches' +1 restores
        # the raw 1-based ids torchvision models train on (train.py:47-51)
        train_ds = data_coco.CocoDetectionDataset(
            os.path.join(root, "annotations", split[0]),
            os.path.join(root, "train2017"), label_mode="lvis0")
        val_ds = data_coco.CocoDetectionDataset(
            os.path.join(root, "annotations", split[1]),
            os.path.join(root, "val2017"), label_mode="lvis0")
        num_classes = {"coco": 91, "coco_kp": 2,
                       "lvis": 1204}[args.dataset]
        min_size, max_size = 800, 1333
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

    def _train_step_impl(ts, batch, rng):
        def loss_fn(p):
            losses = adapter.losses({**rest, "params": p}, batch, rng)
            return sum(jnp.asarray(v) for v in losses.values()), losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts["params"])
        updates, new_opt = tx.update(grads, ts["opt_state"], ts["params"])
        new_params = optax.apply_updates(ts["params"], updates)
        return ({"params": new_params, "opt_state": new_opt,
                 "step": ts["step"] + 1}, total, losses)

    train_step = jax.jit(_train_step_impl)

    @jax.jit
    def train_step_u8(ts, batch, rng):
        """Device-ingest train step (VERDICT r3 item 4): uint8 native
        canvas -> per-image min/max-size resize (per-image random
        min-size replayed from the host draw) + normalize + pad INSIDE
        the jitted step, then the same update."""
        from object_detectors_tpu.kernels.preprocess import (
            rcnn_resize_normalize_from_canvas,
        )

        images, _, _ = rcnn_resize_normalize_from_canvas(
            batch["images"], batch["sizes"],
            (args.image_size, args.image_size), max_size=max_size,
            min_sizes=batch["min_sizes"])
        b2 = {k: v for k, v in batch.items()
              if k not in ("sizes", "min_sizes")}
        b2["images"] = images
        return _train_step_impl(ts, b2, rng)

    eval_masks = args.model == "maskrcnn_resnet50_fpn"
    eval_kps = args.model == "keypointrcnn_resnet50_fpn"

    @jax.jit
    def eval_step(params, images):
        if eval_masks:
            return adapter.detect_with_masks({**rest, "params": params},
                                             images)
        if eval_kps:
            return adapter.detect_with_keypoints(
                {**rest, "params": params}, images)
        return adapter.detect({**rest, "params": params}, images)

    ms_eval = (min_size[-1] if isinstance(min_size, (tuple, list))
               else min_size)

    @jax.jit
    def eval_step_u8(params, canvas_u8, sizes):
        """Device-ingest eval: uint8 native canvas -> per-image
        min/max-size bilinear resize + normalize + zero pad on device
        (one jitted program with the detector)."""
        from object_detectors_tpu.kernels.preprocess import (
            rcnn_resize_normalize_from_canvas,
        )

        images, _, _ = rcnn_resize_normalize_from_canvas(
            canvas_u8, sizes, (args.image_size, args.image_size),
            min_size=ms_eval, max_size=max_size)
        if eval_masks:
            return adapter.detect_with_masks({**rest, "params": params},
                                             images)
        if eval_kps:
            return adapter.detect_with_keypoints(
                {**rest, "params": params}, images)
        return adapter.detect({**rest, "params": params}, images)

    def evaluate(params):
        """engine.evaluate parity: iou types bbox (+segm for Mask R-CNN,
        +keypoints OKS for Keypoint R-CNN — engine._get_iou_types);
        returns (bbox mAP, evaluator, extra stats-or-None)."""
        ev = eval_lib.DetectionEvaluator(gt_val, label_map=lambda c: c)
        for batch in rcnn_batches(
                val_ds, args.batch_size, args.image_size, args.max_boxes,
                min_size=min_size, max_size=max_size,
                device_ingest=args.device_ingest):
            if args.device_ingest:
                out = eval_step_u8(params, jnp.asarray(batch["images"]),
                                   jnp.asarray(batch["sizes"]))
            else:
                out = eval_step(params, jnp.asarray(batch["images"]))
            b, sc, lab, v = out[:4]
            masks = np.asarray(out[4]) if eval_masks else None
            kps = np.asarray(out[4]) if eval_kps else None
            keep = batch["image_ids"] >= 0
            ev.update(batch["image_ids"][keep], np.asarray(b)[keep],
                      np.asarray(sc)[keep], np.asarray(lab)[keep],
                      np.asarray(v)[keep], batch["scale_factors"][keep],
                      masks=masks[keep] if masks is not None else None,
                      keypoints=kps[keep] if kps is not None else None)
        ev.synchronize_between_processes()
        stats = ev.summarize()
        extra = None
        if eval_masks:
            extra = ("segm", ev.summarize("segm"))
        elif eval_kps:
            extra = ("keypoints", ev.summarize("keypoints"))
        return float(stats[0]), ev, extra

    if args.test_only:
        mAP, ev, extra = evaluate(train_state["params"])
        if args.dump_json:
            ev.save_detections(args.dump_json)
        print(f"mAP: {mAP:.4f}")
        if extra is not None:
            print(f"{extra[0]} mAP: {float(extra[1][0]):.4f}")
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
                hflip_rng=hflip_rng, with_masks=with_masks,
                with_keypoints=eval_kps,
                augmentation=args.data_augmentation,
                ar_group_factor=args.aspect_ratio_group_factor,
                device_ingest=args.device_ingest)):
            jb = mesh_lib.put_sharded(
                {k: jnp.asarray(v) for k, v in batch.items()
                 if k not in ("image_ids", "scale_factors")}, mesh)
            rng = jax.random.fold_in(
                jax.random.key(args.seed), epoch * 100003 + i)
            step_fn = train_step_u8 if args.device_ingest else train_step
            train_state, total, losses = step_fn(train_state, jb, rng)
            total = float(total)
            if not np.isfinite(total):
                log.error("Loss is %s, stopping (engine.py:40-43)", total)
                return None
            logger.update(loss=total,
                          **{k: float(v) for k, v in losses.items()})
        mAP, _, extra = evaluate(train_state["params"])
        _save(ckpt, f"model_{epoch}", train_state, epoch, mAP)
        _save(ckpt, "last", train_state, epoch, mAP)
        if extra is not None:
            log.info("epoch %d: %s mAP=%.4f", epoch, extra[0],
                     float(extra[1][0]))
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
