"""tf-idf class-reweighting statistics — the IDFTransformer rebuild.

Parity with `yolo/utilities/custom.py:163-262` (and its offline CLI twin
`yolo/utilities/get_idf.py`): from a COCO/LVIS-format annotation dict,
compute per-class inverse-document-frequency weight tables:

* image-level document frequency (how many images contain class c) and
  instance frequency (total annotations of class c);
* variants: smooth  log((N+1)/(df+1))+1; raw  log(N/df);
  prob  log((N-df)/df); normit  -Phi^-1(p); gombit  -log(-log(1-p));
  base2/-base10  -log_k(p); the ``*_obj`` family repeats these with
  instance counts; plus the raw ``img_freq`` / ``instance_freq`` columns.
* classes with zero annotations are dropped (the reference masks them),
  keeping the surviving class order.
* minibatch idf (`IDFTransformer.forward`, custom.py:259-262):
  log((B+1)/(df_batch+1)) + 1 from the batch's per-image class presence —
  provided here as a jit-friendly function of padded labels.

Tables cache to ``<dset>_files/idf.csv`` exactly like the reference.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.special import ndtri

VARIANTS = ("smooth", "raw", "prob", "normit", "gombit", "base2", "base10")


def idf_tables(gt: dict) -> dict:
    """COCO/LVIS-format dict -> {variant: np.ndarray[num_kept_classes]}.

    Also returns 'img_freq', 'instance_freq', and '_kept_category_ids'
    (the surviving category ids in order).
    """
    cat_ids = sorted(c["id"] for c in gt["categories"])
    num_classes = cat_ids[-1] + 1  # reference: last_cat + 1 "for bg"
    per_image: dict[int, np.ndarray] = {}
    for ann in gt["annotations"]:
        row = per_image.setdefault(
            ann["image_id"], np.zeros(num_classes, np.int64))
        row[ann["category_id"]] += 1
    n_images = len(gt["images"])
    counts = np.zeros((n_images, num_classes), np.int64)
    for i, img in enumerate(gt["images"]):
        if img["id"] in per_image:
            counts[i] = per_image[img["id"]]

    mask = counts.sum(0) > 0
    kept_ids = np.nonzero(mask)[0]
    counts = counts[:, mask]

    doc_freq = (counts > 0).sum(0).astype(np.float64)
    instance_freq = counts.sum(0).astype(np.float64)
    n = float(counts.shape[0])

    out = {}
    p = doc_freq / n
    out["smooth"] = np.log((n + 1) / (doc_freq + 1)) + 1
    out["raw"] = np.log(n / doc_freq)
    out["prob"] = np.log((n - doc_freq) / doc_freq)
    out["normit"] = -ndtri(p)
    out["gombit"] = -np.log(-np.log(1 - p))
    out["base2"] = -np.log2(p)
    out["base10"] = -np.log10(p)

    big_n = instance_freq.sum()
    p_obj = instance_freq / big_n
    out["smooth_obj"] = np.log((big_n + 1) / (instance_freq + 1)) + 1
    out["raw_obj"] = np.log(big_n / instance_freq)
    out["prob_obj"] = np.log((big_n - instance_freq) / instance_freq)
    out["gombit_obj"] = -np.log(-np.log(1 - p_obj))
    out["normit_obj"] = -ndtri(p_obj)
    out["base2_obj"] = -np.log2(p_obj)
    out["base10_obj"] = -np.log10(p_obj)

    out["img_freq"] = doc_freq
    out["instance_freq"] = instance_freq
    out["_kept_category_ids"] = kept_ids
    return out


def save_idf_csv(tables: dict, path: str):
    import pandas as pd

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df = pd.DataFrame({k: v for k, v in tables.items()
                       if not k.startswith("_")})
    df.to_csv(path, index=False)


def load_idf_csv(path: str) -> dict:
    import pandas as pd

    df = pd.read_csv(path)
    return {k: df[k].to_numpy() for k in df.columns}


def minibatch_idf(gt_labels, gt_valid, num_classes: int):
    """jit-friendly minibatch idf (custom.py:259-262 / retinanet.py
    minibatch recompute): labels [B, M] padded, valid [B, M] ->
    [num_classes] weights log((B+1)/(present+1)) + 1."""
    import jax.numpy as jnp
    import jax

    b = gt_labels.shape[0]
    onehot = jax.nn.one_hot(gt_labels, num_classes) * gt_valid[..., None]
    present = (jnp.sum(onehot, axis=1) > 0).astype(jnp.float32)  # [B, C]
    df = jnp.sum(present, axis=0)
    return jnp.log((b + 1) / (df + 1)) + 1.0


def eq_rare_mask(img_freq: np.ndarray, threshold: float = 0.0045):
    """EQ-loss rarity mask (custom.py:79-81): 1.0 where image frequency
    share < threshold."""
    freq = img_freq / img_freq.sum()
    return (freq < threshold).astype(np.float32)
